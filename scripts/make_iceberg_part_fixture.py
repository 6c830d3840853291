#!/usr/bin/env python3
"""Build the q271 Iceberg MANIFEST-LEVEL PARTITION PRUNING fixture.

At 100 TB an Iceberg scan never opens every manifest: the manifest
list's `partitions` field carries per-manifest field summaries
(contains_null + lower/upper bounds in Iceberg's single-value binary
serialization — 4-byte little-endian for int), and planning drops
whole manifests whose bounds cannot match the predicate. This fixture
makes that real: each table is partitioned by part = (doc_id//6) % 3,
ONE MANIFEST PER PARTITION (m0/m1/m2), each manifest_file row carrying
the exact [part, part] bounds, and the manifest entries carrying a
REAL partition record (r102 with an int `part` field, not the empty
struct of the q257 fixture).

The engine (q271) must select manifests from the BOUNDS ALONE (probe
part >= 1), open only those, and report live files/rows — a reader
that opens everything can still cheat the sums, so the query also
reports n_manifests_opened, which the oracle pins at 2.

Usage: python3 scripts/make_iceberg_part_fixture.py
Writes: fixtures/iceberg_part_files.parquet
        (blob_key, rel_path, kind, file_bytes)
"""
import hashlib
import struct
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


def entry(part, path, rc, fsz, lo=None, hi=None):
    def bound_map(v):
        # Iceberg single-value serialization: long -> 8-byte LE,
        # keyed by field id 1 (rec_id)
        if v is None:
            return union(0)
        return union(1, varint(1) + varint(1)
                     + avro_bytes(struct.pack("<q", v)) + varint(0))
    df = (
        varint(0)                       # content = DATA
        + string(path)
        + string("PARQUET")
        + varint(part)                  # partition record r102{part}
        + varint(rc)
        + varint(fsz)
        + bound_map(lo)                 # lower_bounds {1: LE64}
        + bound_map(hi)                 # upper_bounds {1: LE64}
        + union(1, varint(0))           # sort_order_id
    )
    return (
        varint(1)                       # status ADDED
        + union(1, varint(99))
        + union(1, varint(1))
        + union(1, varint(1))
        + df
    )


def manifest_file_row(path, length, part, af, ar):
    # Iceberg single-value serialization: int -> 4-byte little-endian
    bound = struct.pack("<i", part)
    summaries = union(1,
        varint(1)
        + (b"\x00"                       # contains_null = false
           + union(1, b"\x00")           # contains_nan = false
           + union(1, avro_bytes(bound))  # lower_bound
           + union(1, avro_bytes(bound)))  # upper_bound
        + varint(0))
    return (
        string(path)
        + varint(length)
        + varint(0)
        + varint(0)                     # content = data
        + varint(1) + varint(1)
        + varint(99)
        + varint(af) + varint(0) + varint(0)
        + varint(ar) + varint(0) + varint(0)
        + summaries
        + union(0)
    )


def main():
    files = {}
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
                ("icebergpart:" + ",".join(f"{d}={n}" for d, n in rows))
                .encode()).hexdigest()
            if key in files:
                continue
            sync = hashlib.md5(("sync:" + key).encode()).digest()
            out_rows = []
            mrows = []
            for x in range(3):
                part = [(d, n) for d, n in rows if (d // 6) % 3 == x]
                n = len(part)
                # 4 files per part, quartile-split by position -> each
                # file covers a DISJOINT rec_id range, so file-level
                # bounds can actually prune (q275)
                entries = []
                for qtr in range(4):
                    grp = [part[i] for i in range(n)
                           if i * 4 // n == qtr]
                    if not grp:
                        continue
                    rc = len(grp)
                    fs = sum(1 + c % 9 for _, c in grp)
                    entries.append(entry(
                        x, f"part-{x}/f-{x}-{qtr}.parquet", rc, fs,
                        lo=min(d for d, _ in grp),
                        hi=max(d for d, _ in grp)))
                m = container(MANIFEST_ENTRY_SCHEMA, entries,
                              sync, "deflate")
                out_rows.append((f"m{x}.avro", "manifest", m))
                mrows.append(manifest_file_row(f"m{x}.avro", len(m),
                                               x, len(entries), n))
            snap = container(MANIFEST_FILE_SCHEMA, mrows, sync, "null")
            out_rows.append(("snap-1.avro", "list", snap))
            files[key] = out_rows
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
        out / "iceberg_part_files.parquet",
    )
    print(f"iceberg_part_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
