#!/usr/bin/env python3
"""Build the q315 Hudi MERGE-ON-READ fixture.

MOR tables (hudi.apache.org/tech-specs) keep a parquet BASE file per
file group plus `.{fileId}_{baseInstant}.log.{version}_{token}` log
files of framed blocks; the read view merges blocks whose instants
belong to COMPLETED (delta)commits over the base, in instant order,
last-wins per record key, delete blocks dropping keys. Block frame
mirrored by sources/HudiLog.scala: magic #HUDI#, BE64 blocksize
(version..total-length), BE32 version 1, BE32 type (1 delete, 3 avro
data), header map (BE32 count; BE32 key / BE32 len / utf8 —
1 INSTANT_TIME, 3 SCHEMA), BE64 content length, content, empty footer
map, BE64 total block length incl. magic. Avro data content: BE32
version, BE32 count, BE32 len + bare binary datum per record. Delete
content: BE32 version, BE32 count, BE32 len + utf8 key.

The three baits:
  - fg0's log carries an UPDATE block (instant 2: d%3==0 -> val+7)
    and a DELETE block (instant 3: d%5==0 removed): a base-only
    reader returns stale rows and the val/row sums break;
  - fg1's log block belongs to instant 4, present only as
    `.deltacommit.inflight` — NEVER completed: a reader that applies
    every block it finds surfaces the +999 poison;
  - d%15==0 keys are updated at 2 AND deleted at 3 — wrong block
    ordering resurrects them.

Values: rec_id = doc_id, val = (doc_id * 13) % 1000.

Usage: python3 scripts/make_hudi_mor_fixture.py
Writes: fixtures/hudi_mor_files.parquet
"""
import hashlib
import io
import json
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
SCHEMA_JSON = ('{"type":"record","name":"rec","fields":'
               '[{"name":"rec_id","type":"long"},'
               '{"name":"val","type":"long"}]}')


def val(d):
    return (d * 13) % 1000


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


def zz(v):
    z = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def avro_rec(rec_id, v):
    return zz(rec_id) + zz(v)


def wmap(entries):
    out = bytearray(struct.pack(">i", len(entries)))
    for k, v in entries:
        vb = v.encode("utf-8")
        out += struct.pack(">ii", k, len(vb)) + vb
    return bytes(out)


def block(block_type, header, content):
    body = bytearray()
    body += struct.pack(">ii", 1, block_type)
    body += wmap(header)
    body += struct.pack(">q", len(content)) + content
    body += wmap([])  # footer
    blocksize = len(body) + 8
    total = 6 + 8 + blocksize
    return (b"#HUDI#" + struct.pack(">q", blocksize) + bytes(body) +
            struct.pack(">q", total))


def data_block(instant, records):
    content = struct.pack(">ii", 1, len(records)) + b"".join(
        struct.pack(">i", len(r)) + r for r in records)
    return block(3, [(1, instant), (3, SCHEMA_JSON)], content)


def delete_block(instant, keys):
    content = struct.pack(">ii", 1, len(keys)) + b"".join(
        struct.pack(">i", len(k.encode())) + k.encode() for k in keys)
    return block(1, [(1, instant)], content)


def commit_json(stats):
    return json.dumps({
        "partitionToWriteStats": {"p": [
            {"fileId": fid, "path": path, "numWrites": n,
             "numDeletes": 0, "numUpdateWrites": 0}
            for fid, path, n in stats]},
        "operation": "UPSERT",
    }, sort_keys=True).encode("utf-8")


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
                ("hudimor:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            fg = {x: [d for d in ids if (d // 6) % 2 == x]
                  for x in range(2)}
            t1, t2, t3, t4 = ("00000000000001", "00000000000002",
                              "00000000000003", "00000000000004")
            base0 = data_file(fg[0])
            base1 = data_file(fg[1])
            upd = [avro_rec(d, val(d) + 7) for d in fg[0] if d % 3 == 0]
            dels = [str(d) for d in fg[0] if d % 5 == 0]
            poison = [avro_rec(d, val(d) + 999) for d in fg[1]]
            log0 = data_block(t2, upd) + delete_block(t3, dels)
            log1 = data_block(t4, poison)
            rows = [
                (f".hoodie/{t1}.commit", "timeline", commit_json([
                    ("fg0", f"p/fg0_0-0-0_{t1}.parquet", len(fg[0])),
                    ("fg1", f"p/fg1_0-0-0_{t1}.parquet", len(fg[1]))])),
                (f".hoodie/{t2}.deltacommit", "timeline", commit_json([
                    ("fg0", f"p/.fg0_{t1}.log.1_0-0-0", len(upd))])),
                (f".hoodie/{t3}.deltacommit", "timeline", commit_json([
                    ("fg0", f"p/.fg0_{t1}.log.1_0-0-0", len(dels))])),
                # instant 4 never completes
                (f".hoodie/{t4}.deltacommit.inflight", "timeline", b"{}"),
                (f"p/fg0_0-0-0_{t1}.parquet", "data", base0),
                (f"p/fg1_0-0-0_{t1}.parquet", "data", base1),
                (f"p/.fg0_{t1}.log.1_0-0-0", "log", log0),
                (f"p/.fg1_{t1}.log.1_0-0-0", "log", log1),
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
        out / "hudi_mor_files.parquet",
    )
    print(f"hudi_mor_files.parquet: {len(keys)} rows, {len(files)} "
          f"tables, {sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
