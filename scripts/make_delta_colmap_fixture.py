#!/usr/bin/env python3
"""Build the q280 Delta COLUMN-MAPPING fixture.

Column mapping (delta-io/delta PROTOCOL.md, "Column Mapping",
mode=name) decouples logical field names from the physical parquet
column names: every schemaString field carries
`delta.columnMapping.id` and `delta.columnMapping.physicalName` in
its metadata, and the data files are written under the PHYSICAL
names. A reader that resolves parquet columns by logical name reads
nothing — the mapping inside metaData is the only bridge.

Physical names derive from the table key (md5(key + ':' + logical)),
so the engine must actually parse the mapping; nothing is
hardcodable across tables.

Layout per table (documents bucketed doc_id % 6): three data files
split by (doc_id // 6) % 3.

  00000000000000000000.json  protocol(2,5) + metaData(columnMapping
                             mode=name) + add A + add B
  00000000000000000001.json  remove B + add C

Active after replay: {A, C} -> docs with (doc_id // 6) % 3 != 1.
Values are pure functions of doc_id (rec_id = doc_id, score =
(doc_id % 48) / 8.0, exact dyadic) -> fully relational oracle.

Usage: python3 scripts/make_delta_colmap_fixture.py
Writes: fixtures/delta_colmap_files.parquet
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def data_file(ids, phys_rec, phys_score):
    schema = pa.schema([
        pa.field(phys_rec, pa.int64(), nullable=False),
        pa.field(phys_score, pa.float64(), nullable=False),
    ])
    t = pa.table(
        {phys_rec: ids, phys_score: [(d % 48) / 8.0 for d in ids]},
        schema=schema,
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
                ("deltacolmap:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            phys = {c: "col-" + hashlib.md5(
                        (key + ":" + c).encode()).hexdigest()[:8]
                    for c in ("rec_id", "score")}
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            names = {x: f"part-0000{x}-c000.snappy.parquet"
                     for x in range(3)}
            blobs_by_part = {
                x: data_file(parts[x], phys["rec_id"], phys["score"])
                for x in range(3)}
            meta = json.dumps({"metaData": {
                "id": key, "format": {"provider": "parquet",
                                      "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": [
                    {"name": "rec_id", "type": "long",
                     "nullable": False, "metadata": {
                         "delta.columnMapping.id": 1,
                         "delta.columnMapping.physicalName":
                             phys["rec_id"]}},
                    {"name": "score", "type": "double",
                     "nullable": False, "metadata": {
                         "delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName":
                             phys["score"]}},
                ]}),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "2"},
                "createdTime": 1700000000000,
            }}, sort_keys=True)
            proto = json.dumps({"protocol": {
                "minReaderVersion": 2, "minWriterVersion": 5}},
                sort_keys=True)
            commits = [
                "\n".join([proto, meta,
                           add_action(names[0], len(blobs_by_part[0])),
                           add_action(names[1], len(blobs_by_part[1]))]),
                "\n".join([remove_action(names[1]),
                           add_action(names[2], len(blobs_by_part[2]))]),
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
        out / "delta_colmap_files.parquet",
    )
    print(f"delta_colmap_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
