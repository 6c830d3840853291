#!/usr/bin/env python3
"""Build the q262 Iceberg v2 merge-on-read (row-level deletes) fixture.

Modern Iceberg (format v2, iceberg.apache.org/spec) ships row-level
deletes as DELETE FILES in their own manifests: the manifest list's
manifest_file.content field is 1 for delete manifests, and each delete
manifest entry's data_file.content is 1 (POSITION deletes — a parquet
file of (file_path, pos) rows) or 2 (EQUALITY deletes — a parquet file
of the equality columns, with equality_ids naming the field ids). Scan
planning applies a position delete to a data file when
delete.data_sequence_number >= data.data_sequence_number, but an
equality delete only when STRICTLY greater. Live rows = data rows
minus applied deletes; a reader that ignores delete manifests (q258's
shape) overcounts and must fail.

Per table (documents bucketed doc_id % 6, parts (doc_id//6) % 3, data
files P0/P1/P2 at data sequence number 1, rows sorted by doc_id):

  snapshot 1 (merge-on-read):
    md.avro  data manifest: ADDED P0, P1, P2          (content 0)
    dm.avro  delete manifest (content 1), entries:
      pd-0.parquet  POSITION deletes, seq 1: P0 rows with
                    doc_id % 11 == 1  (seq 1 >= 1 -> APPLIES)
      pd-1.parquet  POSITION deletes, seq 2: P1 rows with
                    doc_id % 5 == 0   (applies)
      ed-1.parquet  EQUALITY deletes (equality_ids [1] = rec_id),
                    seq 2: rec_id % 7 == 3  (2 > 1 -> applies)
      ed-0.parquet  EQUALITY deletes, seq 1: rec_id % 7 == 5 —
                    POISON: 1 > 1 is FALSE, a reader that applies
                    seq-equal equality deletes deletes extra rows
                    and fails the oracle
  snapshot 2 (the rewrite that compacts the deletes away):
    mrw.avro ADDED C (exactly the live rows), DELETED P0/P1/P2
  Time travel: both snapshots must report the SAME live_rows /
  live_id_sum through entirely different math.

Data values derive from doc_id alone (rec_id = doc_id, score =
(doc_id % 48) / 8.0), so everything is relationally recomputable.

Usage: python3 scripts/make_iceberg_mor_fixture.py
Writes: fixtures/iceberg_mor_files.parquet
        (blob_key, rel_path, kind, file_bytes)
"""
import hashlib
import io
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def varint(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def string(s: str) -> bytes:
    b = s.encode("utf-8")
    return varint(len(b)) + b


MANIFEST_FILE_SCHEMA = (
    '{"type":"record","name":"manifest_file","fields":['
    '{"name":"manifest_path","type":"string"},'
    '{"name":"manifest_length","type":"long"},'
    '{"name":"partition_spec_id","type":"int"},'
    '{"name":"content","type":"int"},'
    '{"name":"sequence_number","type":"long"},'
    '{"name":"min_sequence_number","type":"long"},'
    '{"name":"added_snapshot_id","type":"long"},'
    '{"name":"added_files_count","type":"int"},'
    '{"name":"existing_files_count","type":"int"},'
    '{"name":"deleted_files_count","type":"int"},'
    '{"name":"added_rows_count","type":"long"},'
    '{"name":"existing_rows_count","type":"long"},'
    '{"name":"deleted_rows_count","type":"long"},'
    '{"name":"key_metadata","type":["null","bytes"]}]}'
)

# v2 manifest entry with the MoR fields: data_file.content routes
# data/position-deletes/equality-deletes, equality_ids names the
# equality columns, sequence_number is written EXPLICITLY (no
# inheritance) so the seq comparisons are honest.
MANIFEST_ENTRY_SCHEMA = (
    '{"type":"record","name":"manifest_entry","fields":['
    '{"name":"status","type":"int"},'
    '{"name":"snapshot_id","type":["null","long"]},'
    '{"name":"sequence_number","type":["null","long"]},'
    '{"name":"file_sequence_number","type":["null","long"]},'
    '{"name":"data_file","type":{"type":"record","name":"r2","fields":['
    '{"name":"content","type":"int"},'
    '{"name":"file_path","type":"string"},'
    '{"name":"file_format","type":"string"},'
    '{"name":"partition","type":{"type":"record","name":"r102",'
    '"fields":[]}},'
    '{"name":"record_count","type":"long"},'
    '{"name":"file_size_in_bytes","type":"long"},'
    '{"name":"equality_ids","type":["null",'
    '{"type":"array","items":"int"}]},'
    '{"name":"sort_order_id","type":["null","int"]}]}}]}'
)


def container(schema_json, records, sync, codec):
    out = bytearray(b"Obj\x01")
    out += varint(2)
    out += string("avro.schema") + string(schema_json)
    out += string("avro.codec") + string(codec)
    out += varint(0)
    out += sync
    body = b"".join(records)
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(body) + c.flush()
    out += varint(len(records)) + varint(len(body)) + body + sync
    return bytes(out)


def union(idx: int, payload: bytes = b"") -> bytes:
    return varint(idx) + payload


def entry(status, seq, content, path, rc, fsz, eq_ids=None):
    df = (
        varint(content)
        + string(path)
        + string("PARQUET")
        + b""                           # partition: empty record
        + varint(rc)
        + varint(fsz)
        + (union(1, varint(len(eq_ids))
                 + b"".join(varint(i) for i in eq_ids) + varint(0))
           if eq_ids else union(0))
        + union(1, varint(0))           # sort_order_id
    )
    return (
        varint(status)
        + union(1, varint(99))          # snapshot_id
        + union(1, varint(seq))         # sequence_number, explicit
        + union(1, varint(seq))         # file_sequence_number
        + df
    )


def manifest_file_row(path, length, content, seq, af, df_, ar, dr):
    return (
        string(path)
        + varint(length)
        + varint(0)                     # partition_spec_id
        + varint(content)               # 0 data / 1 deletes
        + varint(seq) + varint(1)
        + varint(99)
        + varint(af) + varint(0) + varint(df_)
        + varint(ar) + varint(0) + varint(dr)
        + union(0)                      # key_metadata
    )


def pq_bytes(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def data_file(ids):
    return pq_bytes(pa.table(
        {"rec_id": ids, "score": [(d % 48) / 8.0 for d in ids]},
        schema=pa.schema([pa.field("rec_id", pa.int64(), nullable=False),
                          pa.field("score", pa.float64(),
                                   nullable=False)])))


def pos_delete_file(path, positions):
    return pq_bytes(pa.table(
        {"file_path": [path] * len(positions), "pos": positions},
        schema=pa.schema([pa.field("file_path", pa.string(),
                                   nullable=False),
                          pa.field("pos", pa.int64(), nullable=False)])))


def eq_delete_file(ids):
    return pq_bytes(pa.table(
        {"rec_id": ids},
        schema=pa.schema([pa.field("rec_id", pa.int64(),
                                   nullable=False)])))


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
        for table_id, ids in sorted(blobs.items()):
            key = hashlib.md5(
                ("icebergmor:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            sync = hashlib.md5(("sync:" + key).encode()).digest()
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            names = {x: f"part-0000{x}.parquet" for x in range(3)}
            data = {x: data_file(parts[x]) for x in range(3)}
            # position deletes: P0 rows doc_id%11==1 (seq 1, >= data's
            # 1 -> applies) and P1 rows doc_id%5==0 (seq 2)
            pd0_pos = [i for i, d in enumerate(parts[0]) if d % 11 == 1]
            pd1_pos = [i for i, d in enumerate(parts[1]) if d % 5 == 0]
            pd0 = pos_delete_file(names[0], pd0_pos)
            pd1 = pos_delete_file(names[1], pd1_pos)
            # equality deletes on rec_id (field id 1)
            ed1_ids = [d for d in ids if d % 7 == 3]     # seq 2: applies
            ed0_ids = [d for d in ids if d % 7 == 5]     # seq 1: POISON
            ed1 = eq_delete_file(ed1_ids)
            ed0 = eq_delete_file(ed0_ids)
            md = container(MANIFEST_ENTRY_SCHEMA, [
                entry(1, 1, 0, names[x], len(parts[x]), len(data[x]))
                for x in range(3)], sync, "deflate")
            dm = container(MANIFEST_ENTRY_SCHEMA, [
                entry(1, 1, 1, "pd-0.parquet", len(pd0_pos), len(pd0)),
                entry(1, 2, 1, "pd-1.parquet", len(pd1_pos), len(pd1)),
                entry(1, 2, 2, "ed-1.parquet", len(ed1_ids), len(ed1),
                      eq_ids=[1]),
                entry(1, 1, 2, "ed-0.parquet", len(ed0_ids), len(ed0),
                      eq_ids=[1]),
            ], sync, "deflate")
            snap1 = container(MANIFEST_FILE_SCHEMA, [
                manifest_file_row("md.avro", len(md), 0, 1,
                                  3, 0, sum(map(len, parts.values())),
                                  0),
                manifest_file_row("dm.avro", len(dm), 1, 2,
                                  4, 0,
                                  len(pd0_pos) + len(pd1_pos)
                                  + len(ed1_ids) + len(ed0_ids), 0),
            ], sync, "null")
            # snapshot 2: rewrite materializing the MoR result
            live = [d for x in range(3) for d in parts[x]
                    if not (x == 0 and d % 11 == 1)
                    and not (x == 1 and d % 5 == 0)
                    and d % 7 != 3]
            live.sort()
            cdata = data_file(live)
            mrw = container(MANIFEST_ENTRY_SCHEMA, [
                entry(1, 3, 0, "part-C.parquet", len(live), len(cdata)),
                entry(2, 1, 0, names[0], len(parts[0]), len(data[0])),
                entry(2, 1, 0, names[1], len(parts[1]), len(data[1])),
                entry(2, 1, 0, names[2], len(parts[2]), len(data[2])),
            ], sync, "deflate")
            snap2 = container(MANIFEST_FILE_SCHEMA, [
                manifest_file_row("mrw.avro", len(mrw), 0, 3,
                                  1, 3, len(live),
                                  sum(map(len, parts.values()))),
            ], sync, "null")
            meta = (
                '{"format-version":2,'
                f'"table-uuid":"{key[:8]}-0000-4000-8000-{key[8:20]}",'
                f'"location":"s3://corpus/mor{table_id}",'
                '"last-sequence-number":3,'
                '"current-snapshot-id":2,'
                '"snapshots":['
                '{"snapshot-id":1,"sequence-number":2,'
                '"timestamp-ms":1700000000000,'
                '"manifest-list":"snap-1.avro",'
                '"summary":{"operation":"overwrite"}},'
                '{"snapshot-id":2,"sequence-number":3,'
                '"timestamp-ms":1700000001000,'
                '"manifest-list":"snap-2.avro",'
                '"summary":{"operation":"replace"}}]}'
            ).encode("utf-8")
            files[key] = ([("v3.metadata.json", "meta", meta),
                           ("snap-1.avro", "list", snap1),
                           ("snap-2.avro", "list", snap2),
                           ("md.avro", "manifest", md),
                           ("dm.avro", "manifest", dm),
                           ("mrw.avro", "manifest", mrw),
                           ("pd-0.parquet", "delete", pd0),
                           ("pd-1.parquet", "delete", pd1),
                           ("ed-1.parquet", "delete", ed1),
                           ("ed-0.parquet", "delete", ed0),
                           ("part-C.parquet", "data", cdata)] +
                          [(names[x], "data", data[x])
                           for x in range(3)])
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
        out / "iceberg_mor_files.parquet",
    )
    print(f"iceberg_mor_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
