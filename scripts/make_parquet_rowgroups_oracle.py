#!/usr/bin/env python3
"""Build the q330 MULTI-ROW-GROUP parquet-WRITER byte oracle.

The engine writes ONE file of four range-sorted row groups (quartile
split by position), each INT64 chunk carrying its own footer
Statistics (ParquetWrite.writeInt64RowGroups) — the layout a scan
plans row-group pruning on. This script reimplements the layout
INDEPENDENTLY and records each blob's md5 + size, then re-reads its
own bytes with pyarrow (checking num_row_groups AND the per-group
statistics bounds) and DuckDB.

Usage: python3 scripts/make_parquet_rowgroups_oracle.py
Writes: fixtures/parquet_rowgroups_oracle.parquet (blob_key, file_md5,
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


def write_row_groups(names, groups):
    """Mirror of ParquetWrite.writeInt64RowGroups (withStats=True)."""
    out = bytearray(b"PAR1")
    chunks = []  # per group: list of (offset, size, n, mn, mx)
    for rows in groups:
        n = len(rows)
        cs = []
        for c in range(len(names)):
            off = len(out)
            vals = [r[c] for r in rows]
            plain = b"".join(struct.pack("<q", v) for v in vals)
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
            cs.append((off, len(h.out) + len(plain), n,
                       min(vals), max(vals)))
        chunks.append(cs)
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
    f.i64(3, sum(len(g) for g in groups))
    f.lst(4, len(groups), 12)
    for cs in chunks:
        f.elem_struct()
        f.lst(1, len(names), 12)
        for c, nm in enumerate(names):
            off, size, n, mn, mx = cs[c]
            f.elem_struct()
            f.i64(2, off)
            f.struct_field(3)
            f.i32(1, 2)
            f.lst(2, 1, 5)
            f.elem_i32(0)
            f.lst(3, 1, 8)
            f.elem_str(nm)
            f.i32(4, 0)
            f.i64(5, n)
            f.i64(6, size)
            f.i64(7, size)
            f.i64(9, off)
            f.struct_field(12)
            f.i64(3, 0)
            f.bytes_field(5, struct.pack("<q", mx))
            f.bytes_field(6, struct.pack("<q", mn))
            f.end()
            f.end()
            f.end()
        f.i64(2, sum(x[1] for x in cs))
        f.i64(3, cs[0][2])
        f.end()
    f.s(6, "graft parquet writer")
    # column_orders: TYPE_ORDER per leaf (readers must not trust
    # min_value/max_value without it)
    f.lst(7, len(names), 12)
    for _ in names:
        f.elem_struct()
        f.struct_field(1)
        f.end()
        f.end()
    f.end()
    out += f.out
    out += struct.pack("<I", len(f.out))
    out += b"PAR1"
    return bytes(out)


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
                ("pqrg:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            n = len(ids)
            groups = []
            for qtr in range(4):
                g = [(ids[i], (ids[i] * 19) % 977)
                     for i in range(n) if i * 4 // n == qtr]
                if g:
                    groups.append(g)
            b = write_row_groups(["rec_id", "val"], groups)
            # independent readers: pyarrow sees the groups AND their
            # statistics; DuckDB re-aggregates
            pf = pq.ParquetFile(io.BytesIO(b))
            assert pf.metadata.num_row_groups == len(groups)
            for gi, g in enumerate(groups):
                st = pf.metadata.row_group(gi).column(0).statistics
                assert st.min == min(d for d, _ in g)
                assert st.max == max(d for d, _ in g)
            t = pf.read()
            assert t.column("rec_id").to_pylist() == ids
            tmp = Path("/tmp/_pqrg_check.parquet")
            tmp.write_bytes(b)
            (cnt, s1, s2) = duckdb.sql(
                f"SELECT count(*), sum(rec_id), sum(val) FROM '{tmp}'"
            ).fetchall()[0]
            assert cnt == n and s1 == sum(ids)
            assert s2 == sum((d * 19) % 977 for d in ids)
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
        out / "parquet_rowgroups_oracle.parquet",
    )
    print(f"parquet_rowgroups_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
