#!/usr/bin/env python3
"""Build the q257/q258 Iceberg metadata fixture.

Iceberg (public spec, iceberg.apache.org/spec) stores a table's file
inventory as Avro: a snapshot's MANIFEST LIST enumerates manifest
files with added/existing/deleted counts, and each MANIFEST holds
entries (status + data_file record) for the data files. The engine
walks both layers with its generic schema-driven Avro decoder
(sources/AvroGeneric.scala) — the schemas below are the v2 shapes
(subset of fields, full structural variety: nested records, unions,
arrays, named-type reuse, empty partition record).

This script reimplements the Avro object-container layout
independently from the public Avro spec (same posture as
make_avro_fixture.py) — zigzag varints, metadata map, sync-framed
blocks, raw-deflate codec — so the engine's decode is pinned against
an independent writer.

Per table (documents bucketed doc_id % 6; parts by (doc_id//6) % 3):
  m1.avro      part0 EXISTING(0), part1 DELETED(2)   [deflate]
  m2.avro      part2 ADDED(1)                        [deflate]
  snap-1.avro  manifest list: m1 + m2 rows whose manifest_length
               fields are the ACTUAL byte lengths of m1/m2 — binding
               the two layers                        [null codec]
Live files = status != 2 -> parts {0, 2}.

record_count[x] = docs in part x; file_size_in_bytes[x] =
sum(1 + n_chars % 9) over part x — content-derived, so the key is
md5 over (doc_id, n_chars) pairs.

Usage: python3 scripts/make_iceberg_fixture.py
Writes: fixtures/iceberg_meta_files.parquet
        (blob_key, rel_path, kind, file_bytes)
"""
import hashlib
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


def avro_bytes(b: bytes) -> bytes:
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
    '{"name":"partitions","type":["null",{"type":"array","items":'
    '{"type":"record","name":"field_summary","fields":['
    '{"name":"contains_null","type":"boolean"},'
    '{"name":"contains_nan","type":["null","boolean"]},'
    '{"name":"lower_bound","type":["null","bytes"]},'
    '{"name":"upper_bound","type":["null","bytes"]}]}}]},'
    '{"name":"key_metadata","type":["null","bytes"]}]}'
)

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
    '{"name":"column_sizes","type":["null",{"type":"array","items":'
    '{"type":"record","name":"k117_v118","fields":['
    '{"name":"key","type":"int"},{"name":"value","type":"long"}]}}]},'
    '{"name":"null_value_counts","type":["null",'
    '{"type":"array","items":"k117_v118"}]},'  # named-type REUSE
    '{"name":"split_offsets","type":["null",'
    '{"type":"array","items":"long"}]},'
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


def array_of(items) -> bytes:
    if not items:
        return varint(0)
    return varint(len(items)) + b"".join(items) + varint(0)


def manifest_entry(status, part, path, rc, fs):
    df = (
        varint(0)                       # content = DATA
        + string(path)                  # file_path
        + string("PARQUET")             # file_format
        + b""                           # partition: empty record
        + varint(rc)                    # record_count
        + varint(fs)                    # file_size_in_bytes
        # column_sizes: present for even parts (array of kv records)
        + (union(1, array_of([varint(1) + varint(fs // 2),
                              varint(2) + varint(fs - fs // 2)]))
           if part % 2 == 0 else union(0))
        + union(1, array_of([varint(1) + varint(0)]))  # null_value_counts
        + union(1, array_of([varint(4)]))              # split_offsets [4]
        + union(1, varint(0))                          # sort_order_id 0
    )
    return (
        varint(status)
        + union(1, varint(99))          # snapshot_id
        + union(0)                      # sequence_number inherited
        + union(0)                      # file_sequence_number inherited
        + df
    )


def manifest_file_row(path, length, table_id, added_f, existing_f,
                      deleted_f, added_r, existing_r, deleted_r):
    parts_summary = (
        union(1, array_of([
            b"\x00"                          # contains_null = false
            + union(1, b"\x00")              # contains_nan = false
            + union(1, avro_bytes(b"\x01"))  # lower_bound
            + union(1, avro_bytes(b"\xff"))  # upper_bound
        ])) if table_id % 2 == 0 else union(0)
    )
    return (
        string(path)
        + varint(length)
        + varint(0)                     # partition_spec_id
        + varint(0)                     # content = data manifests
        + varint(1) + varint(1)         # sequence numbers
        + varint(99)                    # added_snapshot_id
        + varint(added_f) + varint(existing_f) + varint(deleted_f)
        + varint(added_r) + varint(existing_r) + varint(deleted_r)
        + parts_summary
        + union(0)                      # key_metadata
    )


def main():
    files = {}  # key -> [(rel_path, kind, bytes)]
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, n_chars FROM '{p}' ORDER BY doc_id"
        blobs = {}
        for doc_id, n_chars in duckdb.sql(q).fetchall():
            blobs.setdefault(doc_id % 6, []).append((doc_id, n_chars))
        for table_id, rows in sorted(blobs.items()):
            key = hashlib.md5(
                ("iceberg:" + ",".join(f"{d}={n}" for d, n in rows))
                .encode()).hexdigest()
            if key in files:
                continue
            sync = hashlib.md5(("sync:" + key).encode()).digest()
            rc, fs = {}, {}
            for x in range(3):
                part = [(d, n) for d, n in rows if (d // 6) % 3 == x]
                rc[x] = len(part)
                fs[x] = sum(1 + n % 9 for _, n in part)
            names = {x: f"part-0000{x}.parquet" for x in range(3)}
            m1 = container(MANIFEST_ENTRY_SCHEMA, [
                manifest_entry(0, 0, names[0], rc[0], fs[0]),  # EXISTING
                manifest_entry(2, 1, names[1], rc[1], fs[1]),  # DELETED
            ], sync, "deflate")
            m2 = container(MANIFEST_ENTRY_SCHEMA, [
                manifest_entry(1, 2, names[2], rc[2], fs[2]),  # ADDED
            ], sync, "deflate")
            snap = container(MANIFEST_FILE_SCHEMA, [
                manifest_file_row("m1.avro", len(m1), table_id,
                                  0, 1, 1, 0, rc[0], rc[1]),
                manifest_file_row("m2.avro", len(m2), table_id,
                                  1, 0, 0, rc[2], 0, 0),
            ], sync, "null")
            # snapshot 2 = a COMPACTION: parts 0+2 rewritten into one
            # file; m3 carries the ADDED rewrite plus DELETED entries
            # for the replaced files (the "replace" manifest shape)
            m3 = container(MANIFEST_ENTRY_SCHEMA, [
                manifest_entry(1, 0, "part-C.parquet",
                               rc[0] + rc[2], fs[0] + fs[2]),
                manifest_entry(2, 0, names[0], rc[0], fs[0]),
                manifest_entry(2, 2, names[2], rc[2], fs[2]),
            ], sync, "deflate")
            snap2 = container(MANIFEST_FILE_SCHEMA, [
                manifest_file_row("m3.avro", len(m3), table_id,
                                  1, 0, 2, rc[0] + rc[2], 0,
                                  rc[0] + rc[2]),
            ], sync, "null")
            meta = (
                '{"format-version":2,'
                f'"table-uuid":"{key[:8]}-0000-4000-8000-{key[8:20]}",'
                f'"location":"s3://corpus/t{table_id}",'
                '"last-sequence-number":2,'
                '"current-snapshot-id":2,'
                # named refs (spec "Snapshot References"): the main
                # branch plus a tag pinning the pre-compaction
                # snapshot — q281 resolves BOTH by name
                '"refs":{'
                '"main":{"snapshot-id":2,"type":"branch"},'
                '"pre-compact":{"snapshot-id":1,"type":"tag"}},'
                '"snapshot-log":['
                '{"timestamp-ms":1700000000000,"snapshot-id":1},'
                '{"timestamp-ms":1700000001000,"snapshot-id":2}],'
                '"snapshots":['
                '{"snapshot-id":1,"sequence-number":1,'
                '"timestamp-ms":1700000000000,'
                '"manifest-list":"snap-1.avro",'
                '"summary":{"operation":"append"}},'
                '{"snapshot-id":2,"sequence-number":2,'
                '"timestamp-ms":1700000001000,'
                '"manifest-list":"snap-2.avro",'
                '"summary":{"operation":"replace"}}]}'
            ).encode("utf-8")
            files[key] = [("v3.metadata.json", "meta", meta),
                          ("snap-1.avro", "list", snap),
                          ("snap-2.avro", "list", snap2),
                          ("m1.avro", "manifest", m1),
                          ("m2.avro", "manifest", m2),
                          ("m3.avro", "manifest", m3)]
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
        out / "iceberg_meta_files.parquet",
    )
    print(f"iceberg_meta_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, {sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
