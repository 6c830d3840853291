#!/usr/bin/env python3
"""Build the q312 own-DEFLATE byte oracle.

The engine's encoder (sources/Deflate.scala) is deliberately simple
and deterministic: greedy LZ77 over 3-byte hash chains (hash
(b0<<10)^(b1<<5)^b2 & 0x7fff, ring prev with monotonic-decrease stale
guard, chain walk limit 64, nearest-first tie-break, no lazy match)
emitted as ONE fixed-Huffman block, wrapped in the engine's minimal
gzip member framing (MTIME=0, XFL=0, OS=255, no name). This script
reimplements that algorithm INDEPENDENTLY, byte for byte — one wrong
Huffman code, extra-bit order, or chain-walk decision changes the md5
and breaks the q312 join — and additionally decodes its own output
with CPython zlib (the canonical decoder), failing the build on any
mismatch.

Usage: python3 scripts/make_deflate_own_oracle.py
Writes: fixtures/deflate_own_oracle.parquet (blob_key, gz_md5, gz_len)
"""
import hashlib
import struct
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
            35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
             3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129,
             193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097,
             6145, 8193, 12289, 16385, 24577]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7,
              8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]


class BitSink:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nb = 0

    def bits(self, v, n):
        self.buf |= (v & ((1 << n) - 1)) << self.nb
        self.nb += n
        while self.nb >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nb -= 8

    def code(self, c, n):
        r = 0
        for i in range(n):
            r = (r << 1) | ((c >> i) & 1)
        self.bits(r, n)

    def finish(self):
        if self.nb > 0:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nb = 0
        return bytes(self.out)


def lit_code(s, v):
    if v <= 143:
        s.code(0x30 + v, 8)
    elif v <= 255:
        s.code(0x190 + (v - 144), 9)
    elif v <= 279:
        s.code(v - 256, 7)
    else:
        s.code(0xC0 + (v - 280), 8)


def len_sym(l):
    if l == 258:
        return 28
    i = len(LEN_BASE) - 1
    while LEN_BASE[i] > l:
        i -= 1
    return i


def dist_sym(d):
    i = len(DIST_BASE) - 1
    while DIST_BASE[i] > d:
        i -= 1
    return i


def compress_fixed(data):
    n = len(data)
    s = BitSink()
    s.bits(1, 1)
    s.bits(1, 2)
    MASK = (1 << 15) - 1
    head = [-1] * (1 << 15)
    prev = [0] * (1 << 15)

    def hsh(i):
        return ((data[i] << 10) ^ (data[i + 1] << 5) ^ data[i + 2]) \
            & MASK

    def insert(i):
        if i + 3 <= n:
            h = hsh(i)
            prev[i & MASK] = head[h]
            head[h] = i

    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            cand = head[hsh(i)]
            chain = 0
            max_l = min(258, n - i)
            while cand >= 0 and i - cand <= 32768 and chain < 64:
                l = 0
                while l < max_l and data[cand + l] == data[i + l]:
                    l += 1
                if l > best_len:
                    best_len = l
                    best_dist = i - cand
                nxt = prev[cand & MASK]
                cand = -1 if nxt >= cand else nxt
                chain += 1
        if best_len >= 3:
            ls = len_sym(best_len)
            lit_code(s, 257 + ls)
            s.bits(best_len - LEN_BASE[ls], LEN_EXTRA[ls])
            ds = dist_sym(best_dist)
            s.code(ds, 5)
            s.bits(best_dist - DIST_BASE[ds], DIST_EXTRA[ds])
            for j in range(i, i + best_len):
                insert(j)
            i += best_len
        else:
            lit_code(s, data[i])
            insert(i)
            i += 1
    lit_code(s, 256)
    return s.finish()


def gzip_member_own(data):
    body = compress_fixed(data)
    out = bytearray(b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff")
    out += body
    out += struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
    out += struct.pack("<I", len(data) & 0xFFFFFFFF)
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
                ("deflate:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in rows_out:
                continue
            payload = "".join(
                "doc-%d-%s\n" % (d, "x" * (d % 17)) for d in ids
            ).encode()
            m = gzip_member_own(payload)
            # the canonical decoder must reproduce the payload exactly
            assert zlib.decompress(m[10:], -15) == payload
            import gzip as _gzip
            assert _gzip.decompress(m) == payload
            # the size law the query enforces
            assert len(m) * 2 < len(payload)
            rows_out[key] = (hashlib.md5(m).hexdigest(), len(m))
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "gz_md5": [rows_out[k][0] for k in keys],
            "gz_len": pa.array(
                [rows_out[k][1] for k in keys], pa.int64()),
        }),
        out / "deflate_own_oracle.parquet",
    )
    print(f"deflate_own_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
