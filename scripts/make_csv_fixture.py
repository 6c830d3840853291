#!/usr/bin/env python3
"""Build the q291 CSV (RFC 4180) fixture.

Python's csv module is the INDEPENDENT writer: QUOTE_MINIMAL +
CRLF line endings produce canonical RFC 4180 — and every row is a
quoting torture test: `name` embeds a comma, `note` embeds a doubled
quote AND a bare LF, so record boundaries cannot be found by line
splitting (a naive reader shears each row at the embedded newline and
doubles the row count). Values are pure functions of doc_id, so all
hash sums re-derive relationally in DuckDB.

Usage: python3 scripts/make_csv_fixture.py
Writes: fixtures/csv_files.parquet (blob_key, rel_path, kind, file_bytes)
"""
import csv
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def csv_file(ids):
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n",
                   quoting=csv.QUOTE_MINIMAL)
    w.writerow(["doc_id", "name", "note"])
    for d in ids:
        w.writerow([d, f"n,{d % 7}", f'x"{d % 5}"\ny{d % 3}'])
    return buf.getvalue().encode("utf-8")


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
                ("csv:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key not in files:
                files[key] = csv_file(ids)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": ["data-0.csv"] * len(keys),
            "kind": ["data"] * len(keys),
            "file_bytes": pa.array([files[k] for k in keys],
                                   pa.binary()),
        }),
        out / "csv_files.parquet",
    )
    print(f"csv_files.parquet: {len(keys)} tables, "
          f"{sum(len(v) for v in files.values())} bytes")


if __name__ == "__main__":
    main()
