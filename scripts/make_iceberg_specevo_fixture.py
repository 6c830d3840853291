#!/usr/bin/env python3
"""Build the q289 Iceberg PARTITION SPEC EVOLUTION fixture.

Real Iceberg tables evolve their partitioning (spec "Partition
Evolution"): old data files stay written under the OLD spec and new
files under the NEW one; each manifest carries `partition_spec_id`
and scan planning must prune per manifest under ITS OWN spec. The
classic reader bug is applying the table's default (current) spec to
old manifests — pruning by a partition field their files were never
bucketed by — silently dropping every pre-evolution row.

Layout per table (documents doc_id % 6):

  m_old.avro  spec-id 0 (UNPARTITIONED): docs with (d//6) % 2 == 0 in
              two files split by ((d//6)//2) % 2; partition record is
              the EMPTY struct; the manifest-list row carries NO field
              summaries (nothing to prune by).
  m_new.avro  spec-id 1 (partitioned by p2 = ((d//6)//2) % 3): docs
              with (d//6) % 2 == 1 in three files, one per p2 value;
              entries carry a REAL r102{p2} record and the list row
              carries [0,2] summaries.

Probe p2 == 1: spec-1 prunes to one file; spec-0 files must ALL be
read. rows are record_count sums — fully relational.

Usage: python3 scripts/make_iceberg_specevo_fixture.py
Writes: fixtures/iceberg_specevo_files.parquet
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


def union(idx: int, payload: bytes = b"") -> bytes:
    return varint(idx) + payload


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


def entry_schema(part_fields: str) -> str:
    return (
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
        '"fields":[' + part_fields + ']}},'
        '{"name":"record_count","type":"long"},'
        '{"name":"file_size_in_bytes","type":"long"},'
        '{"name":"sort_order_id","type":["null","int"]}]}}]}'
    )


OLD_ENTRY_SCHEMA = entry_schema("")  # unpartitioned: empty r102
NEW_ENTRY_SCHEMA = entry_schema('{"name":"p2","type":"int"}')


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


def entry(path, rc, fsz, p2=None):
    part_rec = b"" if p2 is None else varint(p2)
    df = (
        varint(0)
        + string(path)
        + string("PARQUET")
        + part_rec
        + varint(rc)
        + varint(fsz)
        + union(1, varint(0))
    )
    return (
        varint(1)
        + union(1, varint(99))
        + union(1, varint(1))
        + union(1, varint(1))
        + df
    )


def manifest_file_row(path, length, spec_id, af, ar, bounds=None):
    if bounds is None:
        summaries = union(0)
    else:
        lo, hi = bounds
        summaries = union(1,
            varint(1)
            + (b"\x00"
               + union(1, b"\x00")
               + union(1, avro_bytes(struct.pack("<i", lo)))
               + union(1, avro_bytes(struct.pack("<i", hi))))
            + varint(0))
    return (
        string(path)
        + varint(length)
        + varint(spec_id)
        + varint(0)
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
                ("icebergevo:" + ",".join(f"{d}={n}" for d, n in rows))
                .encode()).hexdigest()
            if key in files:
                continue
            sync = hashlib.md5(("sync:" + key).encode()).digest()
            old = [(d, n) for d, n in rows if (d // 6) % 2 == 0]
            new = [(d, n) for d, n in rows if (d // 6) % 2 == 1]
            # spec 0: two unpartitioned files
            old_entries = []
            for g in range(2):
                grp = [(d, n) for d, n in old if (d // 6 // 2) % 2 == g]
                old_entries.append(entry(
                    f"old/f-{g}.parquet", len(grp),
                    sum(1 + n % 9 for _, n in grp)))
            m_old = container(OLD_ENTRY_SCHEMA, old_entries, sync,
                              "deflate")
            # spec 1: one file per p2 bucket
            new_entries = []
            for p2 in range(3):
                grp = [(d, n) for d, n in new if (d // 6 // 2) % 3 == p2]
                new_entries.append(entry(
                    f"new/f-{p2}.parquet", len(grp),
                    sum(1 + n % 9 for _, n in grp), p2=p2))
            m_new = container(NEW_ENTRY_SCHEMA, new_entries, sync,
                              "deflate")
            snap = container(MANIFEST_FILE_SCHEMA, [
                manifest_file_row("m_old.avro", len(m_old), 0,
                                  len(old_entries), len(old)),
                manifest_file_row("m_new.avro", len(m_new), 1,
                                  len(new_entries), len(new),
                                  bounds=(0, 2)),
            ], sync, "null")
            meta = (
                '{"format-version":2,'
                f'"table-uuid":"{key[:8]}-0000-4000-8000-{key[8:20]}",'
                f'"location":"s3://corpus/t{table_id}",'
                '"last-sequence-number":1,'
                '"current-snapshot-id":1,'
                '"default-spec-id":1,'
                '"partition-specs":['
                '{"spec-id":0,"fields":[]},'
                '{"spec-id":1,"fields":['
                '{"name":"p2","transform":"identity",'
                '"source-id":1,"field-id":1000}]}],'
                '"snapshots":['
                '{"snapshot-id":1,"sequence-number":1,'
                '"timestamp-ms":1700000000000,'
                '"manifest-list":"snap-1.avro",'
                '"summary":{"operation":"append"}}]}'
            ).encode("utf-8")
            files[key] = [("v2.metadata.json", "meta", meta),
                          ("snap-1.avro", "list", snap),
                          ("m_old.avro", "manifest", m_old),
                          ("m_new.avro", "manifest", m_new)]
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
        out / "iceberg_specevo_files.parquet",
    )
    print(f"iceberg_specevo_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, {sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
