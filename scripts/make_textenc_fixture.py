#!/usr/bin/env python3
"""Build the q293 text-encoding fixture.

The SAME text per table is written four ways — UTF-8, UTF-8 with BOM,
UTF-16LE with BOM, UTF-16BE with BOM (python's codecs are the
independent writer) — and the engine must sniff each and decode to
IDENTICAL content: the output carries one content hash per encoding
and the oracle pins all four to the same relational value. A reader
that assumes UTF-8 everywhere "decodes" the UTF-16 blobs into
NUL-ridden mojibake with a different hash (or, under the engine's
strict decoder, fails them outright).

Usage: python3 scripts/make_textenc_fixture.py
Writes: fixtures/textenc_files.parquet
"""
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def text_of(ids):
    return "".join(f"doc {d}: é→{d % 7}\n" for d in ids)


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
                ("textenc:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            t = text_of(ids)
            files[key] = [
                ("a.txt", "utf-8", t.encode("utf-8")),
                ("b.txt", "utf-8-bom", b"\xef\xbb\xbf" + t.encode("utf-8")),
                # python's utf-16-le/be do NOT emit a BOM; prepend it
                ("c.txt", "utf-16le",
                 b"\xff\xfe" + t.encode("utf-16-le")),
                ("d.txt", "utf-16be",
                 b"\xfe\xff" + t.encode("utf-16-be")),
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
        out / "textenc_files.parquet",
    )
    print(f"textenc_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, {sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
