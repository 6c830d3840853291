#!/usr/bin/env python3
"""Build the q227 progressive-JPEG full-decode oracle fixture.

Progressive (SOF2) with the spectral-selection script the engine's
encoder emits: one interleaved DC scan, then the full 1-63 AC band per
component as separate non-interleaved scans (per-block EOB0 — an EOBn
run of one). Quantized coefficients are IDENTICAL to the baseline
packaging of the same pixels, so the decoded sums are reused from the
same recon math; the byte stream (scan headers, per-scan bit flushes,
the non-interleaved AC grids skipping 4:2:0 padding blocks) is what
this fixture independently predicts. Mixed corpus: even-seed docs
4:2:0, odd-seed 4:4:4 color. No JPEG library anywhere.

Usage: python3 scripts/make_jpeg_prog_fixture.py
Writes: fixtures/media_jpeg_prog_oracle.parquet
"""
import hashlib
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_jpeg_fixture import (ZIGZAG, Q_LUMA, Q_CHROMA, C, DC_LUMA,
                               AC_LUMA, DC_CHROMA, AC_CHROMA, DC_CODES,
                               AC_CODES, BitWriter, seeds)

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def jpeg_prog_stats(s1: int, s2: int):
    w = 8 + s1 % 17
    h = 8 + s2 % 13
    c420 = s1 % 2 == 0
    hmax = 2 if c420 else 1
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (h + 8 * hmax - 1) // (8 * hmax)
    ch_ = [hmax, 1, 1] if c420 else [1, 1, 1]
    blocks_w = [mcu_cols * ch_[c] for c in range(3)]
    blocks_h = [mcu_rows * ch_[c] for c in range(3)]
    cw_px = [(w * ch_[c] + hmax - 1) // hmax for c in range(3)]
    ch_px = [(h * ch_[c] + hmax - 1) // hmax for c in range(3)]
    np_w = [(cw_px[c] + 7) // 8 for c in range(3)]
    np_h = [(ch_px[c] + 7) // 8 for c in range(3)]

    # quantized coefficient blocks over the padded grid + decoded recon
    coefs = []
    recon = []
    for c in range(3):
        q = Q_LUMA if c == 0 else Q_CHROMA
        padw, padh = blocks_w[c] * 8, blocks_h[c] * 8
        xs = np.minimum(np.arange(padw), cw_px[c] - 1)
        ys = np.minimum(np.arange(padh), ch_px[c] - 1)
        plane = ((s2 + (7 + 5 * c) * ys[:, None]
                  + (11 + 2 * c) * xs[None, :] + 31 * c) % 256) \
            .astype(np.float64)
        blocks = {}
        rec = np.zeros_like(plane)
        for br in range(blocks_h[c]):
            for bc in range(blocks_w[c]):
                blk = plane[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] - 128.0
                sq = np.floor((C @ blk @ C.T) / q + 0.5).astype(np.int64)
                blocks[(br, bc)] = sq
                idct = C.T @ (sq * q) @ C
                rec[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] = \
                    np.clip(np.floor(idct + 128.5), 0, 255)
        coefs.append(blocks)
        recon.append(rec)

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
    marker(0xdb)
    w16(2 + 65 * 2)
    for tid, q in enumerate([Q_LUMA, Q_CHROMA]):
        w8(tid)
        flat = q.reshape(64)
        for n in ZIGZAG:
            w8(int(flat[n]))
    marker(0xc2)
    w16(8 + 9)
    w8(8); w16(h); w16(w); w8(3)
    for c in range(3):
        w8(c + 1); w8(ch_[c] << 4 | ch_[c]); w8(0 if c == 0 else 1)
    huffs = [(0, 0, DC_LUMA), (1, 0, AC_LUMA),
             (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    marker(0xc4)
    w16(2 + sum(17 + len(t[1]) for _, _, t in huffs))
    for cls, tid, (bits, vals) in huffs:
        w8(cls << 4 | tid)
        for x in bits:
            w8(x)
        for v in vals:
            w8(v)

    # DC scan: interleaved, Ss=Se=0
    marker(0xda)
    w16(6 + 6)
    w8(3)
    for c in range(3):
        w8(c + 1); w8(0x00 if c == 0 else 0x10)
    w8(0); w8(0); w8(0)
    bwr = BitWriter(out)
    pred = [0, 0, 0]
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for c in range(3):
                for dv in range(ch_[c]):
                    for du in range(ch_[c]):
                        dc = int(coefs[c][(my * ch_[c] + dv,
                                           mx * ch_[c] + du)][0, 0])
                        diff = dc - pred[c]
                        pred[c] = dc
                        s0 = abs(diff).bit_length()
                        bwr.put(*DC_CODES[0 if c == 0 else 1][s0])
                        if s0 > 0:
                            bwr.put(diff if diff >= 0
                                    else diff + (1 << s0) - 1, s0)
    bwr.flush()

    # AC scans: the full 1-63 band per component, non-interleaved
    for c in range(3):
        marker(0xda)
        w16(8)
        w8(1); w8(c + 1); w8(0x00 if c == 0 else 0x01)
        w8(1); w8(63); w8(0)
        bwr = BitWriter(out)
        codes = AC_CODES[0 if c == 0 else 1]
        for br in range(np_h[c]):
            for bc in range(np_w[c]):
                zz = coefs[c][(br, bc)].reshape(64)[ZIGZAG]
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        bwr.put(*codes[0xf0])
                        run -= 16
                    s = abs(v).bit_length()
                    bwr.put(*codes[run << 4 | s])
                    bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run > 0:
                    bwr.put(*codes[0x00])
        bwr.flush()
    marker(0xd9)

    blob = bytes(out)
    sums = [int(recon[c][:ch_px[c], :cw_px[c]].sum()) for c in range(3)]
    tls = [int(recon[c][0, 0]) for c in range(3)]
    return (w, h, len(blob), hashlib.md5(blob).hexdigest(), sums, tls)


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        for (text,) in duckdb.sql(f"SELECT text FROM '{p}'").fetchall():
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key not in rows:
                rows[key] = jpeg_prog_stats(*seeds(text))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)

    def col(pick, typ):
        return pa.array([pick(rows[k]) for k in keys], typ)

    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "jpeg_width": col(lambda r: r[0], pa.int32()),
        "jpeg_height": col(lambda r: r[1], pa.int32()),
        "jpeg_size": col(lambda r: r[2], pa.int64()),
        "jpeg_md5": col(lambda r: r[3], pa.string()),
        "jpeg_sum_c0": col(lambda r: r[4][0], pa.int64()),
        "jpeg_sum_c1": col(lambda r: r[4][1], pa.int64()),
        "jpeg_sum_c2": col(lambda r: r[4][2], pa.int64()),
        "jpeg_tl_c0": col(lambda r: r[5][0], pa.int32()),
        "jpeg_tl_c1": col(lambda r: r[5][1], pa.int32()),
        "jpeg_tl_c2": col(lambda r: r[5][2], pa.int32()),
    })
    pq.write_table(table, out / "media_jpeg_prog_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'media_jpeg_prog_oracle.parquet'}")


if __name__ == "__main__":
    main()
