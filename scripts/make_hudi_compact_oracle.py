#!/usr/bin/env python3
"""Build the q336 Hudi COMPACTION-WRITER byte oracle.

The engine compacts its own MOR table (HudiWrite.compact): it replays
every file slice (completed-only, instant-ordered, last-wins) and
writes, per file group, a fresh base parquet at instant 5 through its
own parquet writer plus a COMPACT `.commit` timeline entry. This
script derives the SAME compacted bytes INDEPENDENTLY — the merged
state from the fixture arithmetic (not by re-parsing), the parquet
layout, the canonical commit JSON — and records the md5 over the
delta files (sorted path, 0x00, bytes). One wrong merged row or one
mis-framed field anywhere breaks the q336 join.

Usage: python3 scripts/make_hudi_compact_oracle.py
Writes: fixtures/hudi_compact_oracle.parquet (blob_key, compact_md5)
"""
import hashlib
import json
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
    """Mirror of ParquetWrite.writeInt64, codec 0, no stats."""
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


def commit_json(op, stats):
    return json.dumps({
        "partitionToWriteStats": {"p": [
            {"fileId": fid, "path": path, "numWrites": n,
             "numDeletes": 0, "numUpdateWrites": 0}
            for fid, path, n in stats]},
        "operation": op,
    }, sort_keys=True).encode("utf-8")


def compact_bundle(ids):
    """The compaction DELTA files for the q318 MOR table over `ids`:
    the merged completed state per file group (instant-2 updates,
    instant-3 deletes; instant 4 is inflight and must NOT appear),
    derived here from the fixture arithmetic rather than by re-parsing
    the table bytes."""
    fg = {x: [d for d in ids if (d // 6) % 2 == x] for x in range(2)}
    t5 = "00000000000005"

    def v(d):
        return (d * 13) % 991

    fg_rows = {
        "fg0": sorted((d, v(d) + 7 if d % 3 == 0 else v(d))
                      for d in fg[0] if d % 5 != 0),
        "fg1": sorted((d, v(d)) for d in fg[1]),
    }

    def dname(fid):
        return f"p/{fid}_0-0-0_{t5}.parquet"

    files = {
        dname(fid): write_int64(["rec_id", "val"], rows)
        for fid, rows in fg_rows.items()
    }
    files[f".hoodie/{t5}.commit"] = commit_json("COMPACT", [
        (fid, dname(fid), len(fg_rows[fid]))
        for fid in sorted(fg_rows)])
    return files


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
                ("hudicompact:" + ",".join(str(d) for d in ids))
                .encode()).hexdigest()
            if key in rows_out:
                continue
            files = compact_bundle(ids)
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
            "compact_md5": [rows_out[k] for k in keys],
        }),
        out / "hudi_compact_oracle.parquet",
    )
    print(f"hudi_compact_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
