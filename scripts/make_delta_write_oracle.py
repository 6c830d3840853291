#!/usr/bin/env python3
"""Build the q299 Delta table WRITE oracle.

q299's engine composes a complete Delta table from first principles —
data files through its own parquet writer (q295's md5-pinned layout)
plus a _delta_log of canonical JSON commits (sorted keys, ', '/': '
separators — exactly python json.dumps(sort_keys=True)). The whole
BUNDLE is deterministic, so this script reimplements it independently
and records md5(concat(path + NUL + bytes, sorted by path)) per
table: one wrong byte anywhere — a parquet field delta, a JSON key
order, an escape — breaks the q299 join.

Usage: python3 scripts/make_delta_write_oracle.py
Writes: fixtures/delta_write_oracle.parquet (blob_key, bundle_md5,
        bundle_len)
"""
import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_parquet_writer_oracle import write_int64  # noqa: E402

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA_STRING = json.dumps({
    "fields": [
        {"metadata": {}, "name": "rec_id", "nullable": False,
         "type": "long"},
        {"metadata": {}, "name": "val", "nullable": False,
         "type": "long"},
    ],
    "type": "struct",
}, sort_keys=True)


def add_action(path, size):
    return json.dumps({"add": {
        "path": path, "partitionValues": {}, "size": size,
        "modificationTime": 1700000000000, "dataChange": True,
    }}, sort_keys=True)


def remove_action(path):
    return json.dumps({"remove": {
        "path": path, "deletionTimestamp": 1700000001000,
        "dataChange": True,
    }}, sort_keys=True)


def bundle_for(key, ids):
    parts = {x: [d for d in ids if (d // 6) % 3 == x] for x in range(3)}
    data = {x: write_int64(["rec_id", "val"],
                           [(d, (d * 11) % 1000) for d in parts[x]])
            for x in range(3)}
    names = {0: "part-A.parquet", 1: "part-B.parquet",
             2: "part-C.parquet"}
    meta = json.dumps({"metaData": {
        "id": key, "format": {"options": {}, "provider": "parquet"},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [], "configuration": {},
        "createdTime": 1700000000000,
    }}, sort_keys=True)
    proto = json.dumps({"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 2}}, sort_keys=True)
    c0 = "\n".join([proto, meta, add_action(names[0], len(data[0])),
                    add_action(names[1], len(data[1]))]) + "\n"
    c1 = "\n".join([remove_action(names[1]),
                    add_action(names[2], len(data[2]))]) + "\n"
    files = {
        "_delta_log/00000000000000000000.json": c0.encode("utf-8"),
        "_delta_log/00000000000000000001.json": c1.encode("utf-8"),
        names[0]: data[0], names[1]: data[1], names[2]: data[2],
    }
    h = hashlib.md5()
    total = 0
    for p in sorted(files):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
        h.update(files[p])
        total += len(files[p])
    return h.hexdigest(), total


def main():
    rows = {}
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
                ("deltawrite:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key not in rows:
                rows[key] = bundle_for(key, ids)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "bundle_md5": [rows[k][0] for k in keys],
            "bundle_len": pa.array([rows[k][1] for k in keys],
                                   pa.int64()),
        }),
        out / "delta_write_oracle.parquet",
    )
    print(f"delta_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
