#!/usr/bin/env python3
"""Build the q295 parquet-WRITER byte oracle.

The engine's from-scratch parquet writer (sources/ParquetWrite.scala)
emits a fully deterministic minimal layout: PAR1, one PLAIN v1 page
per REQUIRED INT64 column, thrift-compact footer. This script
reimplements that layout INDEPENDENTLY (same spec, separate code) and
records each blob's md5 + size — one mis-encoded zigzag, field delta,
or list header anywhere in the file changes the md5 and breaks the
q295 join. It also READS its own bytes back with pyarrow AND duckdb
(independent readers), failing the build if either rejects the
layout.

Usage: python3 scripts/make_parquet_writer_oracle.py
Writes: fixtures/parquet_writer_oracle.parquet (blob_key, file_md5,
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
    """Thrift compact encoder (the spec's field-delta headers,
    zigzag varints, size-prefixed lists)."""

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


def write_int64(names, rows):
    out = bytearray(b"PAR1")
    n = len(rows)
    offsets, sizes = [], []
    for c in range(len(names)):
        offsets.append(len(out))
        payload = 8 * n
        h = TCW()
        h.i32(1, 0)
        h.i32(2, payload)
        h.i32(3, payload)
        h.struct_field(5)
        h.i32(1, n)
        h.i32(2, 0)
        h.i32(3, 3)
        h.i32(4, 3)
        h.end()
        h.end()
        out += h.out
        for r in rows:
            out += struct.pack("<q", r[c])
        sizes.append(len(h.out) + payload)
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
        f.i64(6, sizes[c])
        f.i64(7, sizes[c])
        f.i64(9, offsets[c])
        f.end()
        f.end()
    f.i64(2, sum(sizes))
    f.i64(3, n)
    f.end()
    f.s(6, "graft parquet writer")
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
                ("pqwrite:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            b = write_int64(["rec_id", "val"],
                            [(d, (d * 11) % 1000) for d in ids])
            # independent READERS must accept the layout
            t = pq.read_table(io.BytesIO(b))
            assert t.column("rec_id").to_pylist() == ids
            assert t.column("val").to_pylist() == \
                [(d * 11) % 1000 for d in ids]
            tmp = Path("/tmp/_pqw_check.parquet")
            tmp.write_bytes(b)
            (cnt, s1, s2) = duckdb.sql(
                f"SELECT count(*), sum(rec_id), sum(val) FROM '{tmp}'"
            ).fetchall()[0]
            assert cnt == len(ids) and s1 == sum(ids)
            assert s2 == sum((d * 11) % 1000 for d in ids)
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
        out / "parquet_writer_oracle.parquet",
    )
    print(f"parquet_writer_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
