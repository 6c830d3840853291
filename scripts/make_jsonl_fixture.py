#!/usr/bin/env python3
"""Build the q292 JSONL corpus fixture.

JSONL (one JSON object per line) is THE interchange format for text
corpora. python json with ensure_ascii=True is the independent
writer, which turns every non-ASCII character into a \\uXXXX escape —
so the engine's RFC 8259 string decode (sources/Json.scala) is on the
hot path for every row: a reader that returns raw escape bytes
instead of decoded text changes every hash. Nested objects, arrays,
and embedded quotes/newline escapes ride along. Values are pure
functions of doc_id -> relational oracle.

Usage: python3 scripts/make_jsonl_fixture.py
Writes: fixtures/jsonl_files.parquet
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def jsonl_file(ids):
    buf = io.StringIO()
    for d in ids:
        rec = {
            "doc_id": d,
            "meta": {"lang": f"l{d % 9}", "score": d % 100},
            "tags": [f"t{j}" for j in range(d % 3)],
            # é and → serialize as é / → under ensure_ascii;
            # the embedded quote and newline exercise \" and \n
            "text": f'é{d % 5}→ "q"\nline{d % 4}',
        }
        buf.write(json.dumps(rec, ensure_ascii=True, sort_keys=True))
        buf.write("\n")
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
                ("jsonl:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key not in files:
                files[key] = jsonl_file(ids)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": ["data-0.jsonl"] * len(keys),
            "kind": ["data"] * len(keys),
            "file_bytes": pa.array([files[k] for k in keys],
                                   pa.binary()),
        }),
        out / "jsonl_files.parquet",
    )
    print(f"jsonl_files.parquet: {len(keys)} tables, "
          f"{sum(len(v) for v in files.values())} bytes")


if __name__ == "__main__":
    main()
