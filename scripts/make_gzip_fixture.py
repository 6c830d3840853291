#!/usr/bin/env python3
"""Build the q217 warc.gz member-length oracle fixture.

No SQL engine ships deflate, so the q217 oracle joins each framed WARC
record to its RAW-DEFLATE compressed size, precomputed HERE with
CPython's zlib (canonical zlib — the same library the JVM Deflater
wraps; level-6 output verified byte-identical across the two before the
q190 fixture existed). The record string is rebuilt from the documents
table with the exact q181/q217 framing, and keyed by md5(rec_str) so
one fixture serves every sf dir whose records it covers (the record
embeds doc_id, so text alone is not a sufficient key).

The fixture stores ONLY the deflate size — the gzip member-length
arithmetic (10-byte header + FNAME + NUL + deflate + 8-byte trailer)
stays visible in the oracle SQL, and member offsets are derived there
as the exclusive prefix sum per blob.

Usage: python3 scripts/make_gzip_fixture.py
Writes: fixtures/gzip_member_oracle.parquet  (rec_md5, deflate_len)
"""
import hashlib
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def rec_str(doc_id: int, text: str, n_chars: int) -> str:
    payload = hashlib.md5((text or "").encode("utf-8")).hexdigest() \
        * (1 + n_chars % 7)
    return ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://corpus.example/doc/{doc_id}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n{payload}\r\n\r\n")


def deflate_len(b: bytes) -> int:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate, level 6
    return len(c.compress(b) + c.flush())


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}'"
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            r = rec_str(doc_id, text, n_chars).encode("ascii")
            key = hashlib.md5(r).hexdigest()
            if key not in rows:
                rows[key] = deflate_len(r)
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    table = pa.table({
        "rec_md5": pa.array(keys, pa.string()),
        "deflate_len": pa.array([rows[k] for k in keys], pa.int32()),
    })
    pq.write_table(table, out / "gzip_member_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'gzip_member_oracle.parquet'}")


if __name__ == "__main__":
    main()
