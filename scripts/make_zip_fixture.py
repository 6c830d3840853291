#!/usr/bin/env python3
"""Build the q202 ZIP central-directory oracle fixture.

The q202 archive blobs carry two STORED entries per document whose
CRC-32 fields the Spark side computes with the engine's own crc32()
column function. No SQL engine ships crc32, so (q190/q199 precedent)
the oracle joins a table of the two per-document CRCs precomputed HERE
with CPython's zlib.crc32 — an implementation independent of the JVM's
java.util.zip.CRC32 (both are the standard reflected 0xEDB88320 CRC; a
mismatch would fail the oracle's byte-identical blob rebuild). Keyed by
md5(text); entry payloads are ASCII md5 hex strings, so byte and
character lengths agree across engines.

Usage: python3 scripts/make_zip_fixture.py
Writes: fixtures/zip_crc_oracle.parquet (text_md5, crc_doc, crc_meta)
"""
import hashlib
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def crcs(text: str):
    md = hashlib.md5((text or "").encode("utf-8")).hexdigest()
    meta = hashlib.md5(((text or "") + ":meta").encode("utf-8")).hexdigest()
    return (zlib.crc32(md.encode("ascii")) & 0xFFFFFFFF,
            zlib.crc32(meta.encode("ascii")) & 0xFFFFFFFF)


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        for (text,) in duckdb.sql(f"SELECT text FROM '{p}'").fetchall():
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key not in rows:
                rows[key] = crcs(text)
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "crc_doc": pa.array([rows[k][0] for k in keys], pa.int64()),
        "crc_meta": pa.array([rows[k][1] for k in keys], pa.int64()),
    })
    pq.write_table(table, out / "zip_crc_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'zip_crc_oracle.parquet'}")


if __name__ == "__main__":
    main()
