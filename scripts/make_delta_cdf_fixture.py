#!/usr/bin/env python3
"""Build the q282 Delta CHANGE DATA FEED fixture.

CDF (delta-io/delta PROTOCOL.md, "Add CDC File") turns a table's
commits into a row-change stream: when a commit carries `cdc` actions
the change rows come ONLY from those `_change_data/` files (whose
`_change_type` column says insert / update_preimage /
update_postimage / delete); a commit with dataChange add/remove but
NO cdc actions synthesizes its changes (adds -> insert rows). A
reader that double-counts (cdc AND the commit's own add/remove) or
that misses the synthesis path reports wrong change counts.

Layout per table (documents doc_id % 6), parts by (doc_id // 6) % 3:

  0.json  protocol + metaData(enableChangeDataFeed=true)
          + add A(part0) + add B(part1)
  1.json  UPDATE of B: remove B + add B2 (val+1) + cdc pre + cdc post
  2.json  add C(part2)                  (no cdc -> synthesized inserts)

Changes for versions 1..2: update_preimage/update_postimage = part1
rows (post val = pre val + 1), insert = part2 rows. val(d) =
(d * 7) % 1000 keeps everything integer and relational.

Usage: python3 scripts/make_delta_cdf_fixture.py
Writes: fixtures/delta_cdf_files.parquet
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def val(d):
    return (d * 7) % 1000


def data_file(ids, bump=0):
    schema = pa.schema([
        pa.field("rec_id", pa.int64(), nullable=False),
        pa.field("val", pa.int64(), nullable=False),
    ])
    t = pa.table({"rec_id": ids, "val": [val(d) + bump for d in ids]},
                 schema=schema)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def cdc_file(ids, change_type, bump=0):
    schema = pa.schema([
        pa.field("rec_id", pa.int64(), nullable=False),
        pa.field("val", pa.int64(), nullable=False),
        pa.field("_change_type", pa.string(), nullable=False),
    ])
    t = pa.table({
        "rec_id": ids,
        "val": [val(d) + bump for d in ids],
        "_change_type": [change_type] * len(ids),
    }, schema=schema)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def add_action(path, size, data_change=True):
    return json.dumps({"add": {
        "path": path, "partitionValues": {}, "size": size,
        "modificationTime": 1700000000000, "dataChange": data_change,
    }}, sort_keys=True)


def remove_action(path):
    return json.dumps({"remove": {
        "path": path, "deletionTimestamp": 1700000001000,
        "dataChange": True,
    }}, sort_keys=True)


def cdc_action(path, size):
    return json.dumps({"cdc": {
        "path": path, "partitionValues": {}, "size": size,
        "dataChange": False,
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
                ("deltacdf:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            a = data_file(parts[0])
            b = data_file(parts[1])
            b2 = data_file(parts[1], bump=1)
            c = data_file(parts[2])
            pre = cdc_file(parts[1], "update_preimage")
            post = cdc_file(parts[1], "update_postimage", bump=1)
            meta = json.dumps({"metaData": {
                "id": key, "format": {"provider": "parquet",
                                      "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": [
                    {"name": "rec_id", "type": "long",
                     "nullable": False, "metadata": {}},
                    {"name": "val", "type": "long",
                     "nullable": False, "metadata": {}},
                ]}),
                "partitionColumns": [],
                "configuration": {"delta.enableChangeDataFeed": "true"},
                "createdTime": 1700000000000,
            }}, sort_keys=True)
            proto = json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 4}},
                sort_keys=True)
            commits = [
                "\n".join([proto, meta,
                           add_action("part-A.parquet", len(a)),
                           add_action("part-B.parquet", len(b))]),
                "\n".join([remove_action("part-B.parquet"),
                           add_action("part-B2.parquet", len(b2)),
                           cdc_action("_change_data/cdc-pre.parquet",
                                      len(pre)),
                           cdc_action("_change_data/cdc-post.parquet",
                                      len(post))]),
                add_action("part-C.parquet", len(c)),
            ]
            rows = []
            for v, body in enumerate(commits):
                rows.append((f"_delta_log/{v:020d}.json", "log",
                             (body + "\n").encode("utf-8")))
            rows += [
                ("part-A.parquet", "data", a),
                ("part-B.parquet", "data", b),
                ("part-B2.parquet", "data", b2),
                ("part-C.parquet", "data", c),
                ("_change_data/cdc-pre.parquet", "cdc", pre),
                ("_change_data/cdc-post.parquet", "cdc", post),
            ]
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
        out / "delta_cdf_files.parquet",
    )
    print(f"delta_cdf_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
