#!/usr/bin/env python3
"""Build the q304/q305 XZ fixture.

XZ (tukaani.org/xz/xz-file-format.txt — the public spec) is the other
archive codec crawl-era corpora ship in (kernel sources, many HF
dataset mirrors, Wikipedia incremental dumps). python's lzma module
(liblzma) is the INDEPENDENT writer. Content is a pure function of
doc_id so the q304 container census (uncompressed size from the
INDEX) and the q305 full-decode hash are both relational.

Two variants per table:
  - CRC32 check, single-stream, preset 6 (the common shape)
  - CRC64 check (liblzma's default) — the other check the walk must
    classify

Usage: python3 scripts/make_xz_fixture.py
Writes: fixtures/xz_files.parquet (blob_key, rel_path, kind,
        file_bytes)
"""
import hashlib
import lzma
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def text_of(ids):
    return "".join(f"doc {d}: payload {(d * 17) % 1000}\n"
                   for d in ids)


def main():
    files = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id FROM '{p}' ORDER BY doc_id"
        blobs = {}
        for (doc_id,) in duckdb.sql(q).fetchall():
            blobs.setdefault(doc_id % 6, []).append(doc_id)
        for blob_id, ids in sorted(blobs.items()):
            key = hashlib.md5(
                ("xz:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            raw = text_of(ids).encode("utf-8")
            half = len(ids) // 2
            raw1 = text_of(ids[:half]).encode("utf-8")
            raw2 = text_of(ids[half:]).encode("utf-8")
            files[key] = [
                ("a.xz", "crc32", lzma.compress(
                    raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC32,
                    preset=6)),
                ("b.xz", "crc64", lzma.compress(
                    raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64,
                    preset=6)),
                # `cat a.xz b.xz` with 4-byte stream padding between —
                # a VALID .xz per the spec (q307); liblzma agrees:
                ("c.xz", "concat",
                 lzma.compress(raw1, format=lzma.FORMAT_XZ,
                               check=lzma.CHECK_CRC32, preset=6)
                 + b"\x00" * 4
                 + lzma.compress(raw2, format=lzma.FORMAT_XZ,
                                 check=lzma.CHECK_CRC32, preset=6)),
                # legacy .lzma (FORMAT_ALONE: props + dict size +
                # unknown length + end marker) — q309
                ("d.lzma", "alone",
                 lzma.compress(raw, format=lzma.FORMAT_ALONE)),
            ]
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys, paths, kinds, blobs_col = [], [], [], []
    for k in sorted(files):
        for rel_path, kind, b in files[k]:
            keys.append(k)
            paths.append(rel_path)
            kinds.append(kind)
            blobs_col.append(b)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": paths,
            "kind": kinds,
            "file_bytes": pa.array(blobs_col, pa.binary()),
        }),
        out / "xz_files.parquet",
    )
    print(f"xz_files.parquet: {len(keys)} rows, {len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
