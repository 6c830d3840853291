#!/usr/bin/env python3
"""Build the q261 Delta checkpoint fixture.

Real Delta tables (public PROTOCOL.md, github.com/delta-io/delta) do
not replay JSON commits from version 0 forever: every N commits the
writer emits `<version>.checkpoint.parquet` — the complete table state
as one PARQUET file of action rows (protocol / metaData / add / remove
tombstones) — and points `_last_checkpoint` at it. Old JSON commits
are then vacuumed, so a reader that only tails JSON (q254) breaks the
moment the log is cleaned. The correct read is: `_last_checkpoint` ->
checkpoint parquet -> apply only JSON commits AFTER it.

The checkpoint's `add` rows force the two parquet shapes the engine's
byte-level reader gains in round 12: nested-STRUCT leaves (add.path,
add.size, remove.path, metaData.id, protocol.minReaderVersion) and MAP
columns (add.partitionValues: the 3-level key_value layout with
repetition levels).

Per table (documents bucketed by doc_id % 6, partition label
part = (doc_id // 6) % 3, data files P0/P1/P2):

  v0 json   protocol + metaData + add P0 {part=0} + add P1 {part=1}
  v1 json   remove P1 + add P2 {part=2}
  v2 json   add P0 AGAIN (no-op re-add)
  v2 checkpoint parquet: protocol, metaData, add P0, add P2,
            remove P1 (tombstone — checkpoints KEEP tombstones)
  _last_checkpoint  {"version": 2}
  v3 json   remove P0 + add P1 {part=1}     (post-checkpoint tail)

Live after replay: {P1, P2} -> docs with part != 0; part values come
from BOTH sources (P1's from the v3 JSON, P2's from the checkpoint
MAP column), so the oracle checks the map decode end to end.

EVEN blob_ids ship with v0-v2 JSON VACUUMED (only v3 remains): the
checkpoint is the only way to answer. ODD blob_ids keep the full JSON
so the engine can cross-check replay-from-checkpoint == full-JSON
replay.

Fixture rows: (blob_key, rel_path, kind, file_bytes), kind in
log/ckpt/ckptmeta/data. Data values derive from doc_id alone (rec_id =
doc_id, score = (doc_id % 48) / 8.0, exact dyadic).

Usage: python3 scripts/make_delta_ckpt_fixture.py
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

DATA_SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("score", pa.float64(), nullable=False),
])

# The checkpoint schema mirrors PROTOCOL.md's action struct (trimmed to
# the fields the replay needs, plus a LIST inside metaData so the
# nesting census is honest about what real checkpoints carry).
CKPT_SCHEMA = pa.schema([
    pa.field("add", pa.struct([
        pa.field("path", pa.string()),
        pa.field("partitionValues", pa.map_(pa.string(), pa.string())),
        pa.field("size", pa.int64()),
        pa.field("modificationTime", pa.int64()),
        pa.field("dataChange", pa.bool_()),
    ])),
    pa.field("remove", pa.struct([
        pa.field("path", pa.string()),
        pa.field("deletionTimestamp", pa.int64()),
        pa.field("dataChange", pa.bool_()),
    ])),
    pa.field("metaData", pa.struct([
        pa.field("id", pa.string()),
        pa.field("partitionColumns", pa.list_(pa.string())),
    ])),
    pa.field("protocol", pa.struct([
        pa.field("minReaderVersion", pa.int32()),
        pa.field("minWriterVersion", pa.int32()),
    ])),
])


def data_file(ids):
    t = pa.table(
        {"rec_id": ids, "score": [(d % 48) / 8.0 for d in ids]},
        schema=DATA_SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def ckpt_file(rows):
    t = pa.Table.from_pylist(rows, schema=CKPT_SCHEMA)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def add_action(path, part, size):
    return json.dumps({"add": {
        "path": path, "partitionValues": {"part": str(part)},
        "size": size, "modificationTime": 1700000000000,
        "dataChange": True,
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
                ("deltackpt:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            names = {x: f"part={x}/part-0000{x}-c000.snappy.parquet"
                     for x in range(3)}
            data = {x: data_file(parts[x]) for x in range(3)}
            meta = json.dumps({"metaData": {
                "id": key,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": [
                    {"name": "rec_id", "type": "long",
                     "nullable": False, "metadata": {}},
                    {"name": "score", "type": "double",
                     "nullable": False, "metadata": {}},
                ]}),
                "partitionColumns": ["part"], "configuration": {},
                "createdTime": 1700000000000,
            }}, sort_keys=True)
            proto = json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 2}},
                sort_keys=True)
            commits = {
                0: "\n".join([proto, meta,
                              add_action(names[0], 0, len(data[0])),
                              add_action(names[1], 1, len(data[1]))]),
                1: "\n".join([remove_action(names[1]),
                              add_action(names[2], 2, len(data[2]))]),
                2: add_action(names[0], 0, len(data[0])),
                3: "\n".join([remove_action(names[0]),
                              add_action(names[1], 1, len(data[1]))]),
            }
            ckpt_rows = [
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 2}},
                {"metaData": {"id": key, "partitionColumns": ["part"]}},
                {"add": {"path": names[0],
                         "partitionValues": [("part", "0")],
                         "size": len(data[0]),
                         "modificationTime": 1700000000000,
                         "dataChange": False}},
                {"add": {"path": names[2],
                         "partitionValues": [("part", "2")],
                         "size": len(data[2]),
                         "modificationTime": 1700000000000,
                         "dataChange": False}},
                {"remove": {"path": names[1],
                            "deletionTimestamp": 1700000001000,
                            "dataChange": False}},
            ]
            rows = []
            vacuumed = blob_id % 2 == 0
            for v, body in sorted(commits.items()):
                if vacuumed and v <= 2:
                    continue  # pre-checkpoint JSON cleaned away
                rows.append((f"_delta_log/{v:020d}.json", "log",
                             (body + "\n").encode("utf-8")))
            rows.append((f"_delta_log/{2:020d}.checkpoint.parquet",
                         "ckpt", ckpt_file(ckpt_rows)))
            rows.append(("_delta_log/_last_checkpoint", "ckptmeta",
                         json.dumps({"version": 2, "size": 5})
                         .encode("utf-8")))
            for x in range(3):
                rows.append((names[x], "data", data[x]))
            files[key] = rows

            # ---- q272 variant: MULTI-PART checkpoint, fully vacuumed
            # pre-checkpoint JSON (the multipart read is the ONLY
            # answer). Same actions split across two parts; part file
            # names per PROTOCOL.md:
            # <v>.checkpoint.<part>.<parts>.parquet
            keym = hashlib.md5(
                ("deltackptm:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keym not in files:
                rowsm = [(f"_delta_log/{3:020d}.json", "log",
                          (commits[3] + "\n").encode("utf-8"))]
                # part1: protocol, metaData (id fixed for this
                # variant), add P0; part2: add P2, remove P1
                part1 = [
                    {"metaData": {"id": keym,
                                  "partitionColumns": ["part"]}}
                    if "metaData" in r else r for r in ckpt_rows[:3]]
                part2 = ckpt_rows[3:]
                rowsm.append((
                    f"_delta_log/{2:020d}.checkpoint."
                    f"{1:010d}.{2:010d}.parquet",
                    "ckpt", ckpt_file(part1)))
                rowsm.append((
                    f"_delta_log/{2:020d}.checkpoint."
                    f"{2:010d}.{2:010d}.parquet",
                    "ckpt", ckpt_file(part2)))
                rowsm.append(("_delta_log/_last_checkpoint", "ckptmeta",
                              json.dumps({"version": 2, "size": 5,
                                          "parts": 2}).encode("utf-8")))
                for x in range(3):
                    rowsm.append((names[x], "data", data[x]))
                files[keym] = rowsm
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
        out / "delta_ckpt_files.parquet",
    )
    print(f"delta_ckpt_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
