#!/usr/bin/env python3
"""Build the q321 DATA_PAGE_V2 parquet-WRITER byte oracle.

The engine's generalized writer emits v2 data pages for the q310
corpus schema: levels OUTSIDE the codec with their RLE byte lengths
declared in the header (no LE32 prefixes in the body), num_nulls /
num_rows header fields, multi-page chunks (pageRows = n//4), the
dictionary chunk's RLE_DICTIONARY values per page, footer Statistics.
This script reimplements that layout INDEPENDENTLY and records each
blob's md5 + size, then re-reads its own bytes with pyarrow AND
duckdb, failing the build if either disagrees.

Usage: python3 scripts/make_parquet_v2_write_oracle.py
Writes: fixtures/parquet_v2_write_oracle.parquet (blob_key, file_md5,
        file_bytes_len)
"""
import hashlib
import io
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
LANGS = ["en", "es", "fr", "de", "pt"]


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

    def bytes_field(self, fid, b):
        self._hdr(fid, 8)
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


def page_header_v2(uncomp, comp, num_vals, num_nulls, num_rows,
                   encoding, dl_bytes, rl_bytes):
    h = TCW()
    h.i32(1, 3)
    h.i32(2, uncomp)
    h.i32(3, comp)
    h.struct_field(8)
    h.i32(1, num_vals)
    h.i32(2, num_nulls)
    h.i32(3, num_rows)
    h.i32(4, encoding)
    h.i32(5, dl_bytes)
    h.i32(6, rl_bytes)
    h.end()
    h.end()
    return bytes(h.out)


def dict_page_header(uncomp, num_vals):
    h = TCW()
    h.i32(1, 2)
    h.i32(2, uncomp)
    h.i32(3, uncomp)
    h.struct_field(7)
    h.i32(1, num_vals)
    h.i32(2, 0)
    h.end()
    h.end()
    return bytes(h.out)


def write_file_v2(fields, data, page_rows):
    """Mirror of ParquetWrite.writeFile(pageV2=True, codec 0,
    withStats=True, pageRows) for flat leaves. fields: [(name, rep,
    ptype, conv)]; data: [(defs, vals, dict)]."""
    out = bytearray(b"PAR1")
    n_leaves = len(fields)
    dict_offsets = [-1] * n_leaves
    data_offsets = [0] * n_leaves
    chunk_comp = [0] * n_leaves
    chunk_uncomp = [0] * n_leaves
    stats = [None] * n_leaves
    used_dict = [False] * n_leaves
    num_rows = len(data[0][0])

    for c, ((name, rep, ptype, conv), (defs, vals, use_dict)) in \
            enumerate(zip(fields, data)):
        is_bin = ptype == 6
        max_def = 1 if rep == 1 else 0
        slots = len(defs)
        present_total = sum(1 for d in defs if d == max_def)
        assert present_total == len(vals)
        null_count = slots - present_total
        if vals:
            if is_bin:
                mn, mx = min(vals), max(vals)
            else:
                mn = struct.pack("<q", min(vals))
                mx = struct.pack("<q", max(vals))
        else:
            mn = mx = None
        stats[c] = (null_count, mn, mx)
        indices = None
        if use_dict:
            used_dict[c] = True
            order = {}
            indices = []
            for v in vals:
                if v not in order:
                    order[v] = len(order)
                indices.append(order[v])
            dvals = list(order)
            pb = bytearray()
            for v in dvals:
                if is_bin:
                    pb += struct.pack("<I", len(v)) + v
                else:
                    pb += struct.pack("<q", v)
            dict_offsets[c] = len(out)
            hb = dict_page_header(len(pb), len(dvals))
            out += hb
            out += pb
            chunk_comp[c] += len(hb) + len(pb)
            chunk_uncomp[c] += len(hb) + len(pb)
        # v2 data pages on record boundaries (flat: 1 slot per record)
        data_offsets[c] = len(out)
        slot_at = 0
        present_at = 0
        while slot_at < slots:
            slot_end = min(slots, slot_at + page_rows)
            n_vals = slot_end - slot_at
            def_runs = (hybrid_rle(defs[slot_at:slot_end], 1)
                        if max_def > 0 else b"")
            present = (sum(1 for d in defs[slot_at:slot_end]
                           if d == max_def)
                       if max_def > 0 else n_vals)
            body = bytearray()
            if use_dict:
                dict_size = len(set(vals))
                bw = max(1, bits_for(max(0, dict_size - 1)))
                if present > 0:
                    body.append(bw)
                    body += hybrid_rle(
                        indices[present_at:present_at + present], bw)
                else:
                    body.append(1)
                encoding = 8
            else:
                for v in vals[present_at:present_at + present]:
                    if is_bin:
                        body += struct.pack("<I", len(v)) + v
                    else:
                        body += struct.pack("<q", v)
                encoding = 0
            unc = len(def_runs) + len(body)
            hb = page_header_v2(unc, unc, n_vals, n_vals - present,
                                n_vals, encoding, len(def_runs), 0)
            out += hb
            out += def_runs
            out += bytes(body)
            chunk_comp[c] += len(hb) + unc
            chunk_uncomp[c] += len(hb) + unc
            present_at += present
            slot_at = slot_end

    f = TCW()
    f.i32(1, 1)
    f.lst(2, n_leaves + 1, 12)
    f.elem_struct()
    f.s(4, "schema")
    f.i32(5, n_leaves)
    f.end()
    for name, rep, ptype, conv in fields:
        f.elem_struct()
        f.i32(1, ptype)
        f.i32(3, rep)
        f.s(4, name)
        if conv >= 0:
            f.i32(6, conv)
        f.end()
    f.i64(3, num_rows)
    f.lst(4, 1, 12)
    f.elem_struct()
    f.lst(1, n_leaves, 12)
    for c, (name, rep, ptype, conv) in enumerate(fields):
        f.elem_struct()
        f.i64(2, dict_offsets[c] if used_dict[c] else data_offsets[c])
        f.struct_field(3)
        f.i32(1, ptype)
        if used_dict[c]:
            f.lst(2, 3, 5)
            f.elem_i32(0)
            f.elem_i32(3)
            f.elem_i32(8)
        else:
            f.lst(2, 2, 5)
            f.elem_i32(0)
            f.elem_i32(3)
        f.lst(3, 1, 8)
        f.elem_str(name)
        f.i32(4, 0)
        f.i64(5, len(data[c][0]))
        f.i64(6, chunk_uncomp[c])
        f.i64(7, chunk_comp[c])
        f.i64(9, data_offsets[c])
        if used_dict[c]:
            f.i64(11, dict_offsets[c])
        null_count, mn, mx = stats[c]
        f.struct_field(12)
        f.i64(3, null_count)
        if mx is not None:
            f.bytes_field(5, mx)
        if mn is not None:
            f.bytes_field(6, mn)
        f.end()
        f.end()
        f.end()
    f.i64(2, sum(chunk_comp))
    f.i64(3, num_rows)
    f.end()
    f.s(6, "graft parquet writer")
    f.end()
    out += f.out
    out += struct.pack("<I", len(f.out))
    out += b"PAR1"
    return bytes(out)


def blob_bytes(ids):
    n = len(ids)
    txts = [("doc-%d-" % d + "x" * (d % 17)).encode() for d in ids]
    lang_defs = [0 if d % 7 == 0 else 1 for d in ids]
    langs = [LANGS[d % 5].encode() for d in ids if d % 7 != 0]
    score_defs = [0 if d % 11 == 3 else 1 for d in ids]
    scores = [(d * d) % 997 for d in ids if d % 11 != 3]
    fields = [("rec_id", 0, 2, -1), ("txt", 0, 6, 0),
              ("lang", 1, 6, 0), ("score", 1, 2, -1)]
    data = [([0] * n, list(ids), False),
            ([0] * n, txts, False),
            (lang_defs, langs, True),
            (score_defs, scores, False)]
    return write_file_v2(fields, data, max(1, n // 4))


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
                ("pqv2w:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            b = blob_bytes(ids)
            t = pq.read_table(io.BytesIO(b))
            assert t.column("rec_id").to_pylist() == ids
            assert t.column("txt").to_pylist() == [
                "doc-%d-" % d + "x" * (d % 17) for d in ids]
            assert t.column("lang").to_pylist() == [
                None if d % 7 == 0 else LANGS[d % 5] for d in ids]
            assert t.column("score").to_pylist() == [
                None if d % 11 == 3 else (d * d) % 997 for d in ids]
            tmp = Path("/tmp/_pqv2w_check.parquet")
            tmp.write_bytes(b)
            (cnt, s1, s2) = duckdb.sql(
                f"SELECT count(*), sum(rec_id), sum(score) "
                f"FROM '{tmp}'").fetchall()[0]
            assert cnt == len(ids) and s1 == sum(ids)
            assert s2 == sum((d * d) % 997 for d in ids if d % 11 != 3)
            rows_out[key] = (hashlib.md5(b).hexdigest(), len(b))
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_md5": [rows_out[k][0] for k in keys],
            "file_bytes_len": pa.array(
                [rows_out[k][1] for k in keys], pa.int64()),
        }),
        out / "parquet_v2_write_oracle.parquet",
    )
    print(f"parquet_v2_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
