#!/usr/bin/env python3
"""Build the q287 Delta VACUUM fixture.

VACUUM (delta-io docs) reclaims storage: it deletes files under the
table directory that are NOT part of the current table state AND are
older than the retention window — i.e. (a) tombstoned files whose
remove.deletionTimestamp predates the cutoff, and (b) untracked files
(present in the directory, never in the log). Files still live in the
current state are never touched, and a tombstone NEWER than the
cutoff is retained (readers of recent versions may still need it).

Layout per table (documents doc_id % 6), parts by (doc_id // 6) % 4:

  0.json  protocol + metaData + add A(part0) + add B(part1) + add D(part3)
  1.json  remove B  (deletionTimestamp OLD -> vacuumable)
          + add C(part2)
  2.json  remove D  (deletionTimestamp NEW -> retained tombstone)
  orphan.parquet   untracked file (same content as B) -> vacuumable

With cutoff between OLD and NEW: deletable = {B, orphan}, retained
tombstone = {D}, live = {A, C}. rec_id = doc_id, score =
(doc_id % 48) / 8.0 -> all row sums relational.

Usage: python3 scripts/make_delta_vacuum_fixture.py
Writes: fixtures/delta_vacuum_files.parquet
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

OLD_TS = 1700000001000   # < cutoff -> vacuumable
NEW_TS = 1700000500000   # > cutoff -> retained
# engine cutoff: 1700000100000

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


def remove_action(path, ts):
    return json.dumps({"remove": {
        "path": path, "deletionTimestamp": ts, "dataChange": True,
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
                ("deltavac:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            parts = {x: [d for d in ids if (d // 6) % 4 == x]
                     for x in range(4)}
            a = data_file(parts[0])
            b = data_file(parts[1])
            c = data_file(parts[2])
            dd = data_file(parts[3])
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
                           add_action("part-A.parquet", len(a)),
                           add_action("part-B.parquet", len(b)),
                           add_action("part-D.parquet", len(dd))]),
                "\n".join([remove_action("part-B.parquet", OLD_TS),
                           add_action("part-C.parquet", len(c))]),
                remove_action("part-D.parquet", NEW_TS),
            ]
            rows = []
            for v, body in enumerate(commits):
                rows.append((f"_delta_log/{v:020d}.json", "log",
                             (body + "\n").encode("utf-8")))
            rows += [
                ("part-A.parquet", "data", a),
                ("part-B.parquet", "data", b),
                ("part-C.parquet", "data", c),
                ("part-D.parquet", "data", dd),
                # untracked: same CONTENT as B, never in the log
                ("orphan.parquet", "data", b),
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
        out / "delta_vacuum_files.parquet",
    )
    print(f"delta_vacuum_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
