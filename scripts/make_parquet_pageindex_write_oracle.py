#!/usr/bin/env python3
"""Build the q313 write-side page-index + bloom byte oracle.

The engine writes multi-page parquet chunks with the PARQUET-922
ColumnIndex/OffsetIndex pair and a PARQUET-41 split-block bloom
(XXH64 seed 0 over the PLAIN encoding, spec salt constants). This
script reimplements the whole deterministic layout INDEPENDENTLY —
page split, per-page bounds, both thrift index structures, the bloom
header + bitset, and XXH64 itself — so one wrong first_row_index,
salt multiply, or block pick changes the md5 and breaks the q313
join. It re-reads its own bytes with pyarrow AND duckdb, and
recomputes the bloom's absent-probe rejections (n_bloom_neg) that the
query's SQL side cannot derive relationally.

Usage: python3 scripts/make_parquet_pageindex_write_oracle.py
Writes: fixtures/parquet_pageindex_write_oracle.parquet
        (blob_key, file_md5, file_bytes_len, n_bloom_neg)
"""
import hashlib
import io
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
MASK64 = (1 << 64) - 1

# ---- XXH64 (spec constants) --------------------------------------------
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc, lane):
    return (_rotl((acc + lane * P2) & MASK64, 31) * P1) & MASK64


def xxh64(b, seed=0):
    n = len(b)
    p = 0
    if n >= 32:
        a1 = (seed + P1 + P2) & MASK64
        a2 = (seed + P2) & MASK64
        a3 = seed & MASK64
        a4 = (seed - P1) & MASK64
        while p + 32 <= n:
            a1 = _round(a1, int.from_bytes(b[p:p + 8], "little"))
            a2 = _round(a2, int.from_bytes(b[p + 8:p + 16], "little"))
            a3 = _round(a3, int.from_bytes(b[p + 16:p + 24], "little"))
            a4 = _round(a4, int.from_bytes(b[p + 24:p + 32], "little"))
            p += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) +
             _rotl(a4, 18)) & MASK64
        for a in (a1, a2, a3, a4):
            h = ((h ^ _round(0, a)) * P1 + P4) & MASK64
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while p + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(b[p:p + 8], "little")),
                   27) * P1 + P4) & MASK64
        p += 8
    if p + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(b[p:p + 4], "little") * P1)
                   & MASK64, 23) * P2 + P3) & MASK64
        p += 4
    while p < n:
        h = (_rotl(h ^ (b[p] * P5) & MASK64, 11) * P1) & MASK64
        p += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


BLOOM_SALT = [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
              0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31]


def bloom_build(keys_plain, ndv):
    num_bytes = 32
    while num_bytes < ndv and num_bytes < (1 << 24):
        num_bytes <<= 1
    bits = bytearray(num_bytes)
    n_blocks = num_bytes // 32
    for k in keys_plain:
        h = xxh64(k, 0)
        block = ((h >> 32) * n_blocks) >> 32
        x = h & 0xFFFFFFFF
        for i in range(8):
            bit = ((x * BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
            w = block * 32 + i * 4 + (bit >> 3)
            bits[w] |= 1 << (bit & 7)
    return bytes(bits)


def bloom_might_contain(bits, key_plain):
    n_blocks = len(bits) // 32
    h = xxh64(key_plain, 0)
    block = ((h >> 32) * n_blocks) >> 32
    x = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((x * BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
        w = block * 32 + i * 4 + (bit >> 3)
        if not (bits[w] >> (bit & 7)) & 1:
            return False
    return True


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
        self._varint(((v << 1) ^ (v >> 63)) & MASK64)

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

    def elem_i64(self, v):
        self._zigzag(v)

    def elem_str(self, txt):
        b = txt.encode("utf-8")
        self._varint(len(b))
        self.out += b

    def elem_bytes(self, b):
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


def write_indexed(names, cols, page_rows, bloom_col):
    """Two REQUIRED INT64 columns, multi-page, stats, CI/OI, bloom on
    bloom_col — mirrors ParquetWrite.writeFile's layout order."""
    n = len(cols[0])
    out = bytearray(b"PAR1")
    n_leaves = len(names)
    data_offsets = [0] * n_leaves
    chunk_sizes = [0] * n_leaves
    stats = [None] * n_leaves
    page_locs = [[] for _ in range(n_leaves)]
    page_mins = [[] for _ in range(n_leaves)]
    page_maxs = [[] for _ in range(n_leaves)]
    for c in range(n_leaves):
        vals = cols[c]
        stats[c] = (0, struct.pack("<q", min(vals)),
                    struct.pack("<q", max(vals)))
        data_offsets[c] = len(out)
        chunk_start = len(out)
        at = 0
        row_at = 0
        while at < n:
            end = min(n, at + page_rows)
            body = b"".join(struct.pack("<q", v) for v in vals[at:end])
            hb = page_header(len(body), end - at)
            page_off = len(out)
            out += hb
            out += body
            page_locs[c].append((page_off, len(hb) + len(body), row_at))
            page_mins[c].append(struct.pack("<q", min(vals[at:end])))
            page_maxs[c].append(struct.pack("<q", max(vals[at:end])))
            row_at += end - at
            at = end
        chunk_sizes[c] = len(out) - chunk_start
    # bloom
    bloom_offsets = [-1] * n_leaves
    bloom_lengths = [-1] * n_leaves
    distinct = []
    seen = set()
    for v in cols[bloom_col]:
        if v not in seen:
            seen.add(v)
            distinct.append(struct.pack("<q", v))
    bits = bloom_build(distinct, len(distinct))
    h = TCW()
    h.i32(1, len(bits))
    for fid in (2, 3, 4):
        h.struct_field(fid)
        h.struct_field(1)
        h.end()
        h.end()
    h.end()
    bloom_offsets[bloom_col] = len(out)
    out += h.out
    out += bits
    bloom_lengths[bloom_col] = len(h.out) + len(bits)
    # ColumnIndexes then OffsetIndexes
    ci_offsets = [0] * n_leaves
    ci_lengths = [0] * n_leaves
    oi_offsets = [0] * n_leaves
    oi_lengths = [0] * n_leaves
    for c in range(n_leaves):
        t = TCW()
        np_ = len(page_locs[c])
        t.lst(1, np_, 1)
        for _ in range(np_):
            t.out.append(2)  # false
        t.lst(2, np_, 8)
        for b in page_mins[c]:
            t.elem_bytes(b)
        t.lst(3, np_, 8)
        for b in page_maxs[c]:
            t.elem_bytes(b)
        t.i32(4, 0)
        t.lst(5, np_, 6)
        for _ in range(np_):
            t.elem_i64(0)
        t.end()
        ci_offsets[c] = len(out)
        ci_lengths[c] = len(t.out)
        out += t.out
    for c in range(n_leaves):
        t = TCW()
        t.lst(1, len(page_locs[c]), 12)
        for off, sz, fri in page_locs[c]:
            t.elem_struct()
            t.i64(1, off)
            t.i32(2, sz)
            t.i64(3, fri)
            t.end()
        t.end()
        oi_offsets[c] = len(out)
        oi_lengths[c] = len(t.out)
        out += t.out
    # footer
    f = TCW()
    f.i32(1, 1)
    f.lst(2, n_leaves + 1, 12)
    f.elem_struct()
    f.s(4, "schema")
    f.i32(5, n_leaves)
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
    f.lst(1, n_leaves, 12)
    for c, nm in enumerate(names):
        f.elem_struct()
        f.i64(2, data_offsets[c])
        f.struct_field(3)
        f.i32(1, 2)
        f.lst(2, 2, 5)
        f.elem_i32(0)
        f.elem_i32(3)
        f.lst(3, 1, 8)
        f.elem_str(nm)
        f.i32(4, 0)
        f.i64(5, n)
        f.i64(6, chunk_sizes[c])
        f.i64(7, chunk_sizes[c])
        f.i64(9, data_offsets[c])
        null_count, mn, mx = stats[c]
        f.struct_field(12)
        f.i64(3, null_count)
        f.bytes_field(5, mx)
        f.bytes_field(6, mn)
        f.end()
        if bloom_offsets[c] >= 0:
            f.i64(14, bloom_offsets[c])
            f.i32(15, bloom_lengths[c])
        f.end()
        f.i64(4, oi_offsets[c])
        f.i32(5, oi_lengths[c])
        f.i64(6, ci_offsets[c])
        f.i32(7, ci_lengths[c])
        f.end()
    f.i64(2, sum(chunk_sizes))
    f.i64(3, n)
    f.end()
    f.s(6, "graft parquet writer")
    f.end()
    out += f.out
    out += struct.pack("<I", len(f.out))
    out += b"PAR1"
    return bytes(out), bits


def main():
    rows_out = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        blobs = {}
        for (doc_id,) in duckdb.sql(
                f"SELECT doc_id FROM '{p}' ORDER BY doc_id").fetchall():
            blobs.setdefault(doc_id % 6, []).append(doc_id)
        for blob_id, ids in sorted(blobs.items()):
            key = hashlib.md5(
                ("pqidx:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            vals = [(d * 17) % 1009 for d in ids]
            pr = max(1, len(ids) // 8)
            b, bits = write_indexed(["rec_id", "val"], [ids, vals],
                                    pr, 0)
            # independent readers
            t = pq.read_table(io.BytesIO(b))
            assert t.column("rec_id").to_pylist() == ids
            assert t.column("val").to_pylist() == vals
            tmp = Path("/tmp/_pqidx_check.parquet")
            tmp.write_bytes(b)
            (cnt, s1) = duckdb.sql(
                f"SELECT count(*), sum(rec_id) FROM '{tmp}'"
            ).fetchall()[0]
            assert cnt == len(ids) and s1 == sum(ids)
            # bloom laws: every present key passes; count absent rejects
            assert all(bloom_might_contain(bits, struct.pack("<q", d))
                       for d in ids)
            mx = ids[-1]
            n_neg = sum(
                1 for k in range(1, 21)
                if not bloom_might_contain(
                    bits, struct.pack("<q", mx + k)))
            rows_out[key] = (hashlib.md5(b).hexdigest(), len(b), n_neg)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_md5": [rows_out[k][0] for k in keys],
            "file_bytes_len": pa.array(
                [rows_out[k][1] for k in keys], pa.int64()),
            "n_bloom_neg": pa.array(
                [rows_out[k][2] for k in keys], pa.int64()),
        }),
        out / "parquet_pageindex_write_oracle.parquet",
    )
    print(f"parquet_pageindex_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
