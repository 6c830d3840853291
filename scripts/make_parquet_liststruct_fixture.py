#!/usr/bin/env python3
"""Build the q294 parquet LIST<STRUCT> fixture.

list<struct<s,e>> is the shape span annotations actually ship in
(token offsets, PII spans, quality slices). Both struct leaves live
under ONE repeated group, so they share identical rep/def level
sequences and a reader must PAIR them positionally — the classic bug
(dropping a slot in one leaf but not the other) keeps every aggregate
sum intact while silently mispairing (s, e) from different elements.
q294's row-hash output ("s:e,s:e,...") is pairing- and
row-structure-sensitive, so any slip breaks the oracle.

Lists are d % 5 long (0..4 — empty lists in every blob; modulus
coprime with the doc_id % 6 split); s = d*5 + j*2, e = s + (j % 3).
pyarrow (dictionary + snappy defaults) is the independent writer.

Usage: python3 scripts/make_parquet_liststruct_fixture.py
Writes: fixtures/parquet_liststruct_files.parquet
"""
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def data_file(ids):
    spans_t = pa.list_(pa.struct([
        pa.field("s", pa.int64(), nullable=False),
        pa.field("e", pa.int64(), nullable=False)]))
    t = pa.table({
        "rec_id": pa.array(ids, pa.int64()),
        "spans": pa.array(
            [[{"s": d * 5 + j * 2, "e": d * 5 + j * 2 + (j % 3)}
              for j in range(d % 5)] for d in ids], spans_t),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


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
                ("parquetls:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key not in files:
                files[key] = data_file(ids)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": ["data-0.parquet"] * len(keys),
            "kind": ["data"] * len(keys),
            "file_bytes": pa.array([files[k] for k in keys],
                                   pa.binary()),
        }),
        out / "parquet_liststruct_files.parquet",
    )
    print(f"parquet_liststruct_files.parquet: {len(keys)} tables, "
          f"{sum(len(v) for v in files.values())} bytes")


if __name__ == "__main__":
    main()
