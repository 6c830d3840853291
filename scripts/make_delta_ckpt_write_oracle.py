#!/usr/bin/env python3
"""Build the q314 Delta-checkpoint-WRITER byte oracle.

The engine writes `<v>.checkpoint.parquet` through its own nested
parquet writer (DeltaWrite.writeCheckpoint -> ParquetWrite.writeFile):
one OPTIONAL group per action kind, v1 def-level sections (pure-RLE
hybrid runs), and `add.partitionValues` as the 3-level MAP layout
(OPTIONAL MAP group -> REPEATED key_value -> REQUIRED key + OPTIONAL
value), uncompressed single-page chunks, thrift-compact footer. This
script reimplements that nested layout INDEPENDENTLY — schema-tree
flattening, def/rep striping, rep-level sections, group footer
elements — and records each blob's checkpoint md5 + size. One
mis-striped level anywhere breaks the q314 join. It then re-reads its
own bytes with pyarrow (an independent reader), failing the build if
the decoded action rows — including the map entries — disagree.

Usage: python3 scripts/make_delta_ckpt_write_oracle.py
Writes: fixtures/delta_ckpt_write_oracle.parquet (blob_key, ckpt_md5,
        ckpt_len)
"""
import hashlib
import io
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


class TCW:
    """Thrift compact encoder (field-delta headers, zigzag varints,
    size-prefixed lists)."""

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


def hybrid_rle(vals, width):
    out = bytearray()

    def varint(v):
        while v & ~0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)

    bw = (width + 7) // 8
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        varint((j - i) << 1)
        v = vals[i]
        for _ in range(bw):
            out.append(v & 0xFF)
            v >>= 8
        i = j
    return bytes(out)


def bits_for(m):
    return m.bit_length()


def page_header(uncomp, comp, num_vals):
    h = TCW()
    h.i32(1, 0)
    h.i32(2, uncomp)
    h.i32(3, comp)
    h.struct_field(5)
    h.i32(1, num_vals)
    h.i32(2, 0)  # PLAIN
    h.i32(3, 3)
    h.i32(4, 3)
    h.end()
    h.end()
    return bytes(h.out)


# The checkpoint schema tree, preorder, mirroring
# DeltaWrite.writeCheckpoint. Each entry: (is_leaf, name, repetition,
# phys_type_or_num_children, converted_type).
SCHEMA_FLAT = [
    (False, "protocol", 1, 1, -1),
    (True, "minReaderVersion", 1, 2, -1),
    (False, "metaData", 1, 1, -1),
    (True, "id", 1, 6, 0),
    (False, "add", 1, 3, -1),
    (True, "path", 1, 6, 0),
    (False, "partitionValues", 1, 1, 1),
    (False, "key_value", 2, 2, 2),
    (True, "key", 0, 6, 0),
    (True, "value", 1, 6, 0),
    (True, "size", 1, 2, -1),
    (False, "remove", 1, 1, -1),
    (True, "path", 1, 6, 0),
]
# Per-leaf derived shapes: (dotted path, max_def, max_rep, phys_type).
LEAVES = [
    (["protocol", "minReaderVersion"], 2, 0, 2),
    (["metaData", "id"], 2, 0, 6),
    (["add", "path"], 2, 0, 6),
    (["add", "partitionValues", "key_value", "key"], 3, 1, 6),
    (["add", "partitionValues", "key_value", "value"], 4, 1, 6),
    (["add", "size"], 2, 0, 2),
    (["remove", "path"], 2, 0, 6),
]


def write_checkpoint(acts):
    """acts: list of dicts with keys add_path/add_size/add_part/
    remove_path/meta_id/min_reader (None/-1 when absent). Mirrors the
    engine's deterministic layout byte for byte."""
    n = len(acts)
    leaf_data = []  # (defs, reps_or_None, values in present order)
    leaf_data.append((
        [2 if a["min_reader"] >= 0 else 0 for a in acts], None,
        [a["min_reader"] for a in acts if a["min_reader"] >= 0]))
    leaf_data.append((
        [2 if a["meta_id"] else 0 for a in acts], None,
        [a["meta_id"].encode() for a in acts if a["meta_id"]]))
    leaf_data.append((
        [2 if a["add_path"] else 0 for a in acts], None,
        [a["add_path"].encode() for a in acts if a["add_path"]]))
    leaf_data.append((
        [3 if a["add_path"] else 0 for a in acts], [0] * n,
        [b"part" for a in acts if a["add_path"]]))
    leaf_data.append((
        [4 if a["add_path"] else 0 for a in acts], [0] * n,
        [a["add_part"].encode() for a in acts if a["add_path"]]))
    leaf_data.append((
        [2 if a["add_path"] else 0 for a in acts], None,
        [a["add_size"] for a in acts if a["add_path"]]))
    leaf_data.append((
        [2 if a["remove_path"] else 0 for a in acts], None,
        [a["remove_path"].encode() for a in acts if a["remove_path"]]))

    out = bytearray(b"PAR1")
    n_leaves = len(LEAVES)
    data_offsets = [0] * n_leaves
    chunk_sizes = [0] * n_leaves
    for c, ((path, max_def, max_rep, ptype), (defs, reps, vals)) in \
            enumerate(zip(LEAVES, leaf_data)):
        body = bytearray()
        if max_rep > 0:
            runs = hybrid_rle(reps, bits_for(max_rep))
            body += struct.pack("<I", len(runs)) + runs
        if max_def > 0:
            runs = hybrid_rle(defs, bits_for(max_def))
            body += struct.pack("<I", len(runs)) + runs
        for v in vals:
            if ptype == 6:
                body += struct.pack("<I", len(v)) + v
            else:
                body += struct.pack("<q", v)
        data_offsets[c] = len(out)
        hb = page_header(len(body), len(body), len(defs))
        out += hb
        out += bytes(body)
        chunk_sizes[c] = len(hb) + len(body)

    f = TCW()
    f.i32(1, 1)
    f.lst(2, len(SCHEMA_FLAT) + 1, 12)
    f.elem_struct()
    f.s(4, "schema")
    f.i32(5, 4)  # four top-level action groups
    f.end()
    for is_leaf, name, rep, x, conv in SCHEMA_FLAT:
        f.elem_struct()
        if is_leaf:
            f.i32(1, x)  # phys type
            f.i32(3, rep)
            f.s(4, name)
            if conv >= 0:
                f.i32(6, conv)
        else:
            f.i32(3, rep)
            f.s(4, name)
            f.i32(5, x)  # num_children
            if conv >= 0:
                f.i32(6, conv)
        f.end()
    f.i64(3, n)  # num_rows (first leaf is unrepeated)
    f.lst(4, 1, 12)
    f.elem_struct()
    f.lst(1, n_leaves, 12)
    for c, (path, max_def, max_rep, ptype) in enumerate(LEAVES):
        f.elem_struct()
        f.i64(2, data_offsets[c])
        f.struct_field(3)
        f.i32(1, ptype)
        f.lst(2, 2, 5)
        f.elem_i32(0)
        f.elem_i32(3)
        f.lst(3, len(path), 8)
        for seg in path:
            f.elem_str(seg)
        f.i32(4, 0)
        f.i64(5, n)
        f.i64(6, chunk_sizes[c])
        f.i64(7, chunk_sizes[c])
        f.i64(9, data_offsets[c])
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
    """Mirror of ParquetWrite.writeInt64, codec 0, no stats (the q295
    md5-pinned layout) — needed only for the add sizes."""
    out = bytearray(b"PAR1")
    n = len(rows)
    offsets = [0] * len(names)
    chunk_sizes = [0] * len(names)
    for c in range(len(names)):
        offsets[c] = len(out)
        plain = b"".join(struct.pack("<q", r[c]) for r in rows)
        h = TCW()
        h.i32(1, 0)
        h.i32(2, len(plain))
        h.i32(3, len(plain))
        h.struct_field(5)
        h.i32(1, n)
        h.i32(2, 0)
        h.i32(3, 3)
        h.i32(4, 3)
        h.end()
        h.end()
        out += h.out
        out += plain
        chunk_sizes[c] = len(h.out) + len(plain)
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


def act(add_path=None, add_size=-1, add_part=None, remove_path=None,
        meta_id=None, min_reader=-1):
    return {"add_path": add_path, "add_size": add_size,
            "add_part": add_part, "remove_path": remove_path,
            "meta_id": meta_id, "min_reader": min_reader}


def blob_checkpoint(bkey, ids):
    parts = [[d for d in ids if (d // 6) % 4 == x] for x in range(4)]
    sizes = [len(write_int64(["rec_id", "val"],
                             [(d, (d * 13) % 991) for d in p]))
             for p in parts]
    return write_checkpoint([
        act(min_reader=1),
        act(meta_id=bkey),
        act(add_path="part-0.parquet", add_size=sizes[0], add_part="0"),
        act(add_path="part-2.parquet", add_size=sizes[2], add_part="2"),
        act(remove_path="part-1.parquet"),
    ])


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
        for blob_id, ids in sorted(blobs.items()):
            key = hashlib.md5(
                ("deltackptw:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            b = blob_checkpoint(key, ids)
            # independent READER: pyarrow must decode the action rows
            # including the 3-level map striping
            t = pq.read_table(io.BytesIO(b))
            assert t.num_rows == 5
            prot = t.column("protocol").to_pylist()
            assert [x and x["minReaderVersion"] for x in prot] == \
                [1, None, None, None, None]
            meta = t.column("metaData").to_pylist()
            assert [x and x["id"] for x in meta] == \
                [None, key, None, None, None]
            add = t.column("add").to_pylist()
            assert [x and x["path"] for x in add] == \
                [None, None, "part-0.parquet", "part-2.parquet", None]
            assert [dict(x["partitionValues"]) for x in add
                    if x and x["path"]] == [{"part": "0"}, {"part": "2"}]
            rem = t.column("remove").to_pylist()
            assert [x and x["path"] for x in rem] == \
                [None, None, None, None, "part-1.parquet"]
            rows_out[key] = (hashlib.md5(b).hexdigest(), len(b))
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "ckpt_md5": [rows_out[k][0] for k in keys],
            "ckpt_len": pa.array(
                [rows_out[k][1] for k in keys], pa.int64()),
        }),
        out / "delta_ckpt_write_oracle.parquet",
    )
    print(f"delta_ckpt_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
