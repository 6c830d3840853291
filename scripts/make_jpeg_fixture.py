#!/usr/bin/env python3
"""Build the q219 JPEG full-decode oracle fixture.

JPEG is LOSSY, so unlike q199/q200 the oracle cannot sum the source
pixels — it must predict what the decoder OUTPUTS after the DCT →
quantize → dequantize → IDCT round trip. This script reimplements the
whole derivation INDEPENDENTLY from the public T.81 spec formulas:
MediaGen seeds → pixel planes → edge-replicated 8x8 blocks → forward
DCT (the orthonormal-matrix definition, numpy) → Annex K quantization →
canonical Annex K Huffman entropy coding (for the byte stream) and
dequantize → IDCT → clamp (for the decoded sums). NO JPEG library is in
the loop anywhere — every constant and formula comes straight from the
spec, so a hash match proves the engine's encoder+decoder implement
T.81, not merely each other.

The fixture pins BOTH directions:
  - jpeg_md5 / jpeg_size: the exact bytes the engine's encoder must
    produce (encoder pin, down to Huffman bit packing and stuffing);
  - jpeg_sum_c* / jpeg_tl_c*: the exact plane sums the engine's decoder
    must recover from those bytes (decoder pin).

Keyed by md5(text) like media_pixels_oracle.parquet. This script and
graft.queries.MediaGen.jpegFor + Multimodal.encodeJpegBaseline /
parseJpegPixels must stay in lockstep.

Usage: python3 scripts/make_jpeg_fixture.py
Writes: fixtures/media_jpeg_oracle.parquet
"""
import hashlib
import math
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

# ---- T.81 constants (Annex K), identical to Multimodal.scala ----------

ZIGZAG = []
for s in range(15):
    rng = list(range(max(0, s - 7), min(7, s) + 1))
    for y in (rng[::-1] if s % 2 == 0 else rng):
        ZIGZAG.append(y * 8 + (s - y))

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64).reshape(8, 8)

# Orthonormal DCT basis: C[u,x] = c(u)/2 * cos((2x+1)u*pi/16)
C = np.array([[(math.sqrt(0.125) if u == 0 else 0.5)
               * math.cos((2 * x + 1) * u * math.pi / 16)
               for x in range(8)] for u in range(8)])

DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])


def huff_codes(bits, vals):
    """Canonical code assignment (T.81 Annex C): sym -> (code, len)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = (huff_codes(*DC_LUMA), huff_codes(*DC_CHROMA))
AC_CODES = (huff_codes(*AC_LUMA), huff_codes(*AC_CHROMA))


class BitWriter:
    """MSB-first bit packing with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self, out: bytearray):
        self.out = out
        self.buf = 0
        self.cnt = 0

    def put(self, code: int, ln: int):
        self.buf = (self.buf << ln) | (code & ((1 << ln) - 1))
        self.cnt += ln
        while self.cnt >= 8:
            b = (self.buf >> (self.cnt - 8)) & 0xff
            self.out.append(b)
            if b == 0xff:
                self.out.append(0)
            self.cnt -= 8
        self.buf &= (1 << self.cnt) - 1

    def flush(self):
        if self.cnt > 0:
            self.put((1 << (8 - self.cnt)) - 1, 8 - self.cnt)


def seeds(text: str):
    hexd = hashlib.md5((text or "").encode("utf-8")).hexdigest()
    return int(hexd[0:15], 16), int(hexd[15:29], 16)


def jpeg_stats(s1: int, s2: int):
    """Replicate MediaGen.jpegFor + encodeJpegBaseline + parseJpegPixels
    from the derivation spec: returns (w, h, nc, size, md5, sums, tls)."""
    w = 8 + s1 % 17
    h = 8 + s2 % 13
    nc = 3 if s1 % 2 == 0 else 1
    bw, bh = (w + 7) // 8, (h + 7) // 8

    # pixel planes, edge-replicated to the block grid
    xs = np.minimum(np.arange(bw * 8), w - 1)
    ys = np.minimum(np.arange(bh * 8), h - 1)
    planes = []
    for c in range(nc):
        vals = (s2 + (7 + 5 * c) * ys[:, None] + (11 + 2 * c) * xs[None, :]
                + 31 * c) % 256
        planes.append(vals.astype(np.float64))

    out = bytearray()

    def w8(v):
        out.append(v & 0xff)

    def w16(v):
        out.append((v >> 8) & 0xff)
        out.append(v & 0xff)

    def marker(m):
        out.append(0xff)
        out.append(m)

    marker(0xd8)
    marker(0xe0)
    w16(16)
    out.extend(b"JFIF\x00")
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)

    qtabs = [Q_LUMA] if nc == 1 else [Q_LUMA, Q_CHROMA]
    marker(0xdb)
    w16(2 + 65 * len(qtabs))
    for tid, q in enumerate(qtabs):
        w8(tid)
        flat = q.reshape(64)
        for n in ZIGZAG:
            w8(int(flat[n]))

    marker(0xc0)
    w16(8 + 3 * nc)
    w8(8); w16(h); w16(w); w8(nc)
    for c in range(nc):
        w8(c + 1); w8(0x11); w8(0 if c == 0 else 1)

    huffs = ([(0, 0, DC_LUMA), (1, 0, AC_LUMA)] if nc == 1 else
             [(0, 0, DC_LUMA), (1, 0, AC_LUMA),
              (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)])
    marker(0xc4)
    w16(2 + sum(17 + len(t[1]) for _, _, t in huffs))
    for cls, tid, (bits, vals) in huffs:
        w8(cls << 4 | tid)
        for b in bits:
            w8(b)
        for v in vals:
            w8(v)

    marker(0xda)
    w16(6 + 2 * nc)
    w8(nc)
    for c in range(nc):
        w8(c + 1)
        w8(0x00 if c == 0 else 0x11)
    w8(0); w8(63); w8(0)

    # entropy coding + the decoded-plane reconstruction in one pass
    bwr = BitWriter(out)
    pred = [0] * nc
    recon = [np.zeros((bh * 8, bw * 8)) for _ in range(nc)]
    for by in range(bh):
        for bx in range(bw):
            for c in range(nc):
                tsel = 0 if c == 0 else 1
                q = qtabs[0] if c == 0 else qtabs[1]
                blk = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = C @ blk @ C.T
                sq = np.floor(coef / q + 0.5).astype(np.int64)
                flat = sq.reshape(64)
                zz = flat[ZIGZAG]
                diff = int(zz[0]) - pred[c]
                pred[c] = int(zz[0])
                s0 = abs(diff).bit_length()
                bwr.put(*DC_CODES[tsel][s0])
                if s0 > 0:
                    bwr.put(diff if diff >= 0 else diff + (1 << s0) - 1, s0)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        bwr.put(*AC_CODES[tsel][0xf0])
                        run -= 16
                    s = abs(v).bit_length()
                    bwr.put(*AC_CODES[tsel][run << 4 | s])
                    bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run > 0:
                    bwr.put(*AC_CODES[tsel][0x00])
                # what the decoder recovers: dequantize -> IDCT -> clamp
                idct = C.T @ (sq * q) @ C
                recon[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    np.clip(np.floor(idct + 128.5), 0, 255)
    bwr.flush()
    marker(0xd9)

    blob = bytes(out)
    sums = [0, 0, 0]
    tls = [0, 0, 0]
    for c in range(nc):
        crop = recon[c][:h, :w]
        sums[c] = int(crop.sum())
        tls[c] = int(crop[0, 0])
    return (w, h, nc, len(blob), hashlib.md5(blob).hexdigest(), sums, tls)


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        for (text,) in duckdb.sql(f"SELECT text FROM '{p}'").fetchall():
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key in rows:
                continue
            rows[key] = jpeg_stats(*seeds(text))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)

    def col(pick, typ):
        return pa.array([pick(rows[k]) for k in keys], typ)

    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "jpeg_width": col(lambda r: r[0], pa.int32()),
        "jpeg_height": col(lambda r: r[1], pa.int32()),
        "jpeg_ncomp": col(lambda r: r[2], pa.int32()),
        "jpeg_size": col(lambda r: r[3], pa.int64()),
        "jpeg_md5": col(lambda r: r[4], pa.string()),
        "jpeg_sum_c0": col(lambda r: r[5][0], pa.int64()),
        "jpeg_sum_c1": col(lambda r: r[5][1], pa.int64()),
        "jpeg_sum_c2": col(lambda r: r[5][2], pa.int64()),
        "jpeg_tl_c0": col(lambda r: r[6][0], pa.int32()),
        "jpeg_tl_c1": col(lambda r: r[6][1], pa.int32()),
        "jpeg_tl_c2": col(lambda r: r[6][2], pa.int32()),
    })
    pq.write_table(table, out / "media_jpeg_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'media_jpeg_oracle.parquet'}")


if __name__ == "__main__":
    main()
