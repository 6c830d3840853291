#!/usr/bin/env python3
"""Build the q318 Hudi MERGE-ON-READ-WRITER byte oracle.

The engine writes a complete MOR table from first principles
(HudiWrite.writeMorTable): base parquet slices through its own
parquet writer (the q295 md5-pinned INT64 layout), log files through
its own #HUDI# block framing (avro data blocks as bare zigzag
datums, delete blocks by key), and a canonical-JSON deltacommit
timeline with an inflight poison. This script reimplements the whole
bundle INDEPENDENTLY — the parquet layout, the block framing, the
commit JSON byte form — and records each table's md5 over sorted
(path, 0x00, bytes). One mis-framed field anywhere breaks the q318
join.

Usage: python3 scripts/make_hudi_mor_write_oracle.py
Writes: fixtures/hudi_mor_write_oracle.parquet (blob_key, bundle_md5)
"""
import hashlib
import json
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
SCHEMA_JSON = ('{"type":"record","name":"rec","fields":'
               '[{"name":"rec_id","type":"long"},'
               '{"name":"val","type":"long"}]}')


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


def zz(v):
    z = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def wmap(entries):
    out = bytearray(struct.pack(">i", len(entries)))
    for k, v in entries:
        vb = v.encode("utf-8")
        out += struct.pack(">ii", k, len(vb)) + vb
    return bytes(out)


def block(block_type, header, content):
    body = bytearray()
    body += struct.pack(">ii", 1, block_type)
    body += wmap(header)
    body += struct.pack(">q", len(content)) + content
    body += wmap([])
    blocksize = len(body) + 8
    total = 6 + 8 + blocksize
    return (b"#HUDI#" + struct.pack(">q", blocksize) + bytes(body) +
            struct.pack(">q", total))


def data_block(instant, records):
    content = struct.pack(">ii", 1, len(records)) + b"".join(
        struct.pack(">i", len(r)) + r for r in records)
    return block(3, [(1, instant), (3, SCHEMA_JSON)], content)


def delete_block(instant, keys):
    content = struct.pack(">ii", 1, len(keys)) + b"".join(
        struct.pack(">i", len(k.encode())) + k.encode() for k in keys)
    return block(1, [(1, instant)], content)


def commit_json(stats):
    return json.dumps({
        "partitionToWriteStats": {"p": [
            {"fileId": fid, "path": path, "numWrites": n,
             "numDeletes": 0, "numUpdateWrites": 0}
            for fid, path, n in stats]},
        "operation": "UPSERT",
    }, sort_keys=True).encode("utf-8")


def mor_bundle(ids):
    fg = {x: [d for d in ids if (d // 6) % 2 == x] for x in range(2)}
    t1, t2, t3, t4 = ("00000000000001", "00000000000002",
                      "00000000000003", "00000000000004")

    def v(d):
        return (d * 13) % 991

    def base(p):
        return write_int64(["rec_id", "val"], [(d, v(d)) for d in p])

    def dname(fid, instant):
        return f"p/{fid}_0-0-0_{instant}.parquet"

    def lname(fid):
        return f"p/.{fid}_{t1}.log.1_0-0-0"

    upd = [d for d in fg[0] if d % 3 == 0]
    dels = [str(d) for d in fg[0] if d % 5 == 0]
    log0 = (data_block(t2, [zz(d) + zz(v(d) + 7) for d in upd]) +
            delete_block(t3, dels))
    log1 = data_block(t4, [zz(d) + zz(v(d) + 999) for d in fg[1]])
    return {
        f".hoodie/{t1}.commit": commit_json([
            ("fg0", dname("fg0", t1), len(fg[0])),
            ("fg1", dname("fg1", t1), len(fg[1]))]),
        f".hoodie/{t2}.deltacommit": commit_json([
            ("fg0", lname("fg0"), len(upd))]),
        f".hoodie/{t3}.deltacommit": commit_json([
            ("fg0", lname("fg0"), len(dels))]),
        f".hoodie/{t4}.deltacommit.inflight": b"{}",
        dname("fg0", t1): base(fg[0]),
        dname("fg1", t1): base(fg[1]),
        lname("fg0"): log0,
        lname("fg1"): log1,
    }


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
                ("hudimorw:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            files = mor_bundle(ids)
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
        out / "hudi_mor_write_oracle.parquet",
    )
    print(f"hudi_mor_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
