#!/usr/bin/env python3
"""Build the q319 Iceberg ROW-LEVEL-DELETE-WRITER byte oracle.

The engine writes a v2 merge-on-read table from first principles
(IcebergWrite.writeMorTable): data files and equality-delete files
through its own INT64 parquet writer, the position-delete file
through its generalized string writer, delete entries in their own
content=1 manifest via the own Avro encoders with EXPLICIT sequence
numbers planting both inequality laws. This script reimplements the
whole bundle INDEPENDENTLY — the parquet layouts, the Avro record
encodings, the metadata.json byte form — and records each table's
md5 over sorted (path, 0x00, bytes).

Usage: python3 scripts/make_iceberg_mor_write_oracle.py
Writes: fixtures/iceberg_mor_write_oracle.parquet (blob_key,
        bundle_md5)
"""
import hashlib
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


# ---- thrift-compact parquet writer mirrors --------------------------------

class TCW:
    def __init__(self):
        self.out = bytearray()
        self.last = [0]

    def _varint(self, v):
        while v & ~0x7F:
            self.out.append((v & 0x7F) | 0x80)
            v >>= 7
        self.out.append(v)

    def _zigzag(self, v):
        self._varint(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))

    def _hdr(self, fid, tpe):
        d = fid - self.last[0]
        if 1 <= d <= 15:
            self.out.append((d << 4) | tpe)
        else:
            self.out.append(tpe)
            self._zigzag(fid)
        self.last[0] = fid

    def i32(self, fid, v):
        self._hdr(fid, 5)
        self._zigzag(v)

    def i64(self, fid, v):
        self._hdr(fid, 6)
        self._zigzag(v)

    def s(self, fid, txt):
        self._hdr(fid, 8)
        b = txt.encode("utf-8")
        self._varint(len(b))
        self.out += b

    def lst(self, fid, size, elem_tpe):
        self._hdr(fid, 9)
        if size < 15:
            self.out.append((size << 4) | elem_tpe)
        else:
            self.out.append(0xF0 | elem_tpe)
            self._varint(size)

    def elem_i32(self, v):
        self._zigzag(v)

    def elem_str(self, txt):
        b = txt.encode("utf-8")
        self._varint(len(b))
        self.out += b

    def struct_field(self, fid):
        self._hdr(fid, 12)
        self.last.insert(0, 0)

    def elem_struct(self):
        self.last.insert(0, 0)

    def end(self):
        self.out.append(0)
        self.last.pop(0)


def page_header(uncomp, num_vals):
    h = TCW()
    h.i32(1, 0)
    h.i32(2, uncomp)
    h.i32(3, uncomp)
    h.struct_field(5)
    h.i32(1, num_vals)
    h.i32(2, 0)
    h.i32(3, 3)
    h.i32(4, 3)
    h.end()
    h.end()
    return bytes(h.out)


def write_flat(fields, cols):
    """Mirror of the engine's single-page REQUIRED flat layouts:
    writeInt64 (all INT64) and writeFile with REQUIRED leaves (mixed
    BYTE_ARRAY/INT64, no levels). fields: [(name, ptype, conv)];
    cols: per-leaf value lists (ints or bytes)."""
    out = bytearray(b"PAR1")
    n = len(cols[0])
    offsets = [0] * len(fields)
    chunk_sizes = [0] * len(fields)
    for c, ((name, ptype, conv), vals) in enumerate(zip(fields, cols)):
        plain = bytearray()
        for v in vals:
            if ptype == 6:
                plain += struct.pack("<I", len(v)) + v
            else:
                plain += struct.pack("<q", v)
        offsets[c] = len(out)
        hb = page_header(len(plain), n)
        out += hb
        out += plain
        chunk_sizes[c] = len(hb) + len(plain)
    f = TCW()
    f.i32(1, 1)
    f.lst(2, len(fields) + 1, 12)
    f.elem_struct()
    f.s(4, "schema")
    f.i32(5, len(fields))
    f.end()
    for name, ptype, conv in fields:
        f.elem_struct()
        f.i32(1, ptype)
        f.i32(3, 0)
        f.s(4, name)
        if conv >= 0:
            f.i32(6, conv)
        f.end()
    f.i64(3, n)
    f.lst(4, 1, 12)
    f.elem_struct()
    f.lst(1, len(fields), 12)
    for c, (name, ptype, conv) in enumerate(fields):
        f.elem_struct()
        f.i64(2, offsets[c])
        f.struct_field(3)
        f.i32(1, ptype)
        f.lst(2, 2, 5)
        f.elem_i32(0)
        f.elem_i32(3)
        f.lst(3, 1, 8)
        f.elem_str(name)
        f.i32(4, 0)
        f.i64(5, n)
        f.i64(6, chunk_sizes[c])
        f.i64(7, chunk_sizes[c])
        f.i64(9, offsets[c])
        f.end()
        f.end()
    f.i64(2, sum(chunk_sizes))
    f.i64(3, n)
    f.end()
    f.s(6, "graft parquet writer")
    f.end()
    out += f.out
    out += struct.pack("<I", len(f.out))
    out += b"PAR1"
    return bytes(out)


def write_int64(names, rows):
    """writeInt64 mirror (encodings list [PLAIN] only, per the q295
    pinned layout)."""
    out = bytearray(b"PAR1")
    n = len(rows)
    offsets = [0] * len(names)
    chunk_sizes = [0] * len(names)
    for c in range(len(names)):
        plain = b"".join(struct.pack("<q", r[c]) for r in rows)
        offsets[c] = len(out)
        hb = page_header(len(plain), n)
        out += hb
        out += plain
        chunk_sizes[c] = len(hb) + len(plain)
    f = TCW()
    f.i32(1, 1)
    f.lst(2, len(names) + 1, 12)
    f.elem_struct()
    f.s(4, "schema")
    f.i32(5, len(names))
    f.end()
    for nm in names:
        f.elem_struct()
        f.i32(1, 2)
        f.i32(3, 0)
        f.s(4, nm)
        f.end()
    f.i64(3, n)
    f.lst(4, 1, 12)
    f.elem_struct()
    f.lst(1, len(names), 12)
    for c, nm in enumerate(names):
        f.elem_struct()
        f.i64(2, offsets[c])
        f.struct_field(3)
        f.i32(1, 2)
        f.lst(2, 1, 5)
        f.elem_i32(0)
        f.lst(3, 1, 8)
        f.elem_str(nm)
        f.i32(4, 0)
        f.i64(5, n)
        f.i64(6, chunk_sizes[c])
        f.i64(7, chunk_sizes[c])
        f.i64(9, offsets[c])
        f.end()
        f.end()
    f.i64(2, sum(chunk_sizes))
    f.i64(3, n)
    f.end()
    f.s(6, "graft parquet writer")
    f.end()
    out += f.out
    out += struct.pack("<I", len(f.out))
    out += b"PAR1"
    return bytes(out)


# ---- avro mirrors ----------------------------------------------------------

def varint(n):
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def string(s):
    b = s.encode("utf-8")
    return varint(len(b)) + b


def union(idx, payload=b""):
    return varint(idx) + payload


LIST_SCHEMA_MOR = (
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

ENTRY_SCHEMA_MOR = (
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


def entry_mor(status, seq, content, path, rc, fsz, eq_ids=None):
    df = (
        varint(content)
        + string(path)
        + string("PARQUET")
        + b""
        + varint(rc)
        + varint(fsz)
        + (union(1, varint(len(eq_ids))
                 + b"".join(varint(i) for i in eq_ids) + varint(0))
           if eq_ids else union(0))
        + union(1, varint(0))
    )
    return (
        varint(status)
        + union(1, varint(99))
        + union(1, varint(seq))
        + union(1, varint(seq))
        + df
    )


def manifest_file_row_mor(path, length, content, seq, af, df_, ar, dr):
    return (
        string(path)
        + varint(length)
        + varint(0)
        + varint(content)
        + varint(seq) + varint(1)
        + varint(99)
        + varint(af) + varint(0) + varint(df_)
        + varint(ar) + varint(0) + varint(dr)
        + union(0)
    )


def mor_bundle(bkey, ids):
    sync = hashlib.md5(("sync:" + bkey).encode()).digest()
    parts = [[d for d in ids if (d // 6) % 3 == x] for x in range(3)]
    names = [f"part-0000{x}.parquet" for x in range(3)]

    def v(d):
        return (d * 17) % 983

    data = [write_int64(["rec_id", "val"], [(d, v(d)) for d in p])
            for p in parts]
    pd0_pos = [i for i, d in enumerate(parts[0]) if d % 11 == 1]
    pd0 = write_flat(
        [("file_path", 6, 0), ("pos", 2, -1)],
        [[names[0].encode()] * len(pd0_pos), pd0_pos])
    ed1_ids = [d for d in ids if d % 7 == 3]
    ed0_ids = [d for d in ids if d % 7 == 5]
    ed1 = write_int64(["rec_id"], [(d,) for d in ed1_ids])
    ed0 = write_int64(["rec_id"], [(d,) for d in ed0_ids])
    dm_data = container(ENTRY_SCHEMA_MOR, [
        entry_mor(1, 1, 0, names[x], len(parts[x]), len(data[x]))
        for x in range(3)], sync)
    dm_del = container(ENTRY_SCHEMA_MOR, [
        entry_mor(1, 1, 1, "pd-0.parquet", len(pd0_pos), len(pd0)),
        entry_mor(1, 2, 2, "ed-1.parquet", len(ed1_ids), len(ed1),
                  eq_ids=[1]),
        entry_mor(1, 1, 2, "ed-0.parquet", len(ed0_ids), len(ed0),
                  eq_ids=[1])], sync)
    lst = container(LIST_SCHEMA_MOR, [
        manifest_file_row_mor("md.avro", len(dm_data), 0, 1, 3, 0,
                              len(ids), 0),
        manifest_file_row_mor("dm.avro", len(dm_del), 1, 2, 3, 0,
                              len(pd0_pos) + len(ed1_ids)
                              + len(ed0_ids), 0)], sync)
    meta = (
        '{"current-snapshot-id": 1, "format-version": 2, '
        '"last-sequence-number": 2, "snapshots": '
        '[{"manifest-list": "snap-1.avro", "sequence-number": 2, '
        '"snapshot-id": 1, "timestamp-ms": 1700000000000}], '
        '"table-uuid": "' + bkey + '"}'
    ).encode("utf-8")
    out = {"v1.metadata.json": meta, "snap-1.avro": lst,
           "md.avro": dm_data, "dm.avro": dm_del,
           "pd-0.parquet": pd0, "ed-1.parquet": ed1,
           "ed-0.parquet": ed0}
    for x in range(3):
        out[names[x]] = data[x]
    return out


def main():
    rows_out = {}
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
                ("icebergmorw:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            files = mor_bundle(key, ids)
            # independent READER: pyarrow decodes the own-written
            # position-delete (string + long) file
            import io
            t = pq.read_table(io.BytesIO(files["pd-0.parquet"]))
            parts0 = [d for d in ids if (d // 6) % 3 == 0]
            want = [i for i, d in enumerate(parts0) if d % 11 == 1]
            assert t.column("pos").to_pylist() == want
            assert set(t.column("file_path").to_pylist()) <= {
                "part-00000.parquet"}
            md = hashlib.md5()
            for path in sorted(files):
                md.update(path.encode())
                md.update(b"\x00")
                md.update(files[path])
            rows_out[key] = md.hexdigest()
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "bundle_md5": [rows_out[k] for k in keys],
        }),
        out / "iceberg_mor_write_oracle.parquet",
    )
    print(f"iceberg_mor_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
