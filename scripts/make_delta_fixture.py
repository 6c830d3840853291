#!/usr/bin/env python3
"""Build the q254 Delta-Lake transaction-log fixture.

The Delta table format (public PROTOCOL.md, github.com/delta-io/delta)
stores table state as a _delta_log of newline-delimited JSON commits:
each version file 000...N.json carries protocol/metaData/add/remove
actions, and the live file set is the last-wins replay of add/remove
by path. The engine (q254) replays the log RELATIONALLY — from_json +
a last-wins window — then decodes the surviving parquet data files
with its own byte-level reader.

Per table (documents bucketed by doc_id % 6), three data files split
the bucket by (doc_id // 6) % 3 and three commits exercise the replay:

  00000000000000000000.json  protocol + metaData + add A + add B
  00000000000000000001.json  remove B + add C      (compaction shape)
  00000000000000000002.json  add A AGAIN           (last-wins dedup:
                             a naive replay double-counts A)

Active after replay: {A, C} -> docs with (doc_id // 6) % 3 != 1.

Fixture rows: (blob_key, rel_path, kind, file_bytes) — kind 'log' or
'data'. Data values derive from doc_id alone (rec_id = doc_id, score =
(doc_id % 48) / 8.0, exact dyadic), so the doc_id list IS the content
and the oracle recomputes every sum relationally.

Usage: python3 scripts/make_delta_fixture.py
"""
import hashlib
import io
import json
import math
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("score", pa.float64(), nullable=False),
])


def data_file(ids):
    t = pa.table(
        {"rec_id": ids, "score": [(d % 48) / 8.0 for d in ids]},
        schema=SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


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


def main():
    files = {}  # key -> list[(rel_path, kind, bytes)]
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
                ("deltalog:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            names = {x: f"part-0000{x}-c000.snappy.parquet"
                     for x in range(3)}
            blobs_by_part = {x: data_file(parts[x]) for x in range(3)}
            meta = json.dumps({"metaData": {
                "id": key, "format": {"provider": "parquet",
                                      "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": [
                    {"name": "rec_id", "type": "long",
                     "nullable": False, "metadata": {}},
                    {"name": "score", "type": "double",
                     "nullable": False, "metadata": {}},
                ]}),
                "partitionColumns": [], "configuration": {},
                "createdTime": 1700000000000,
            }}, sort_keys=True)
            proto = json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 2}},
                sort_keys=True)
            commits = [
                "\n".join([proto, meta,
                           add_action(names[0], len(blobs_by_part[0])),
                           add_action(names[1], len(blobs_by_part[1]))]),
                "\n".join([remove_action(names[1]),
                           add_action(names[2], len(blobs_by_part[2]))]),
                add_action(names[0], len(blobs_by_part[0])),
            ]
            rows = []
            for v, body in enumerate(commits):
                rows.append((f"_delta_log/{v:020d}.json", "log",
                             (body + "\n").encode("utf-8")))
            for x in range(3):
                rows.append((names[x], "data", blobs_by_part[x]))
            files[key] = rows
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
        out / "delta_log_files.parquet",
    )
    print(f"delta_log_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
