#!/usr/bin/env python3
"""Build the q226 restart-marked JPEG full-decode oracle fixture.

Same independence posture as make_jpeg_fixture.py / the 4:2:0 twin,
for streams carrying RESTART INTERVALS (T.81 E.1.4) — the resilience
feature camera JPEGs ship with: a DRI segment declares an interval in
MCUs, and after each interval the entropy stream byte-aligns, a
cycling RST0..RST7 marker lands, and every DC predictor resets. The
derivation (numpy DCT, Annex K tables, canonical Huffman, restart
bookkeeping) is reimplemented here straight from the spec with no JPEG
library, pinning the engine's exact bytes and decoded sums.

Per doc: even-seed docs are 4:2:0 color, odd-seed 4:4:4 color; the
restart interval is 1 + s1 % 4 MCUs, so marker cycling and predictor
resets land mid-image on nearly every row.

Usage: python3 scripts/make_jpeg_rst_fixture.py
Writes: fixtures/media_jpeg_rst_oracle.parquet
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


def jpeg_rst_stats(s1: int, s2: int):
    w = 8 + s1 % 17
    h = 8 + s2 % 13
    c420 = s1 % 2 == 0
    ri = 1 + s1 % 4
    if c420:
        cw, ch = (w + 1) // 2, (h + 1) // 2
        mcu_cols, mcu_rows = (w + 15) // 16, (h + 15) // 16
        ydim, cdim = (w, h, mcu_cols * 16, mcu_rows * 16), \
            (cw, ch, mcu_cols * 8, mcu_rows * 8)
    else:
        cw, ch = w, h
        mcu_cols, mcu_rows = (w + 7) // 8, (h + 7) // 8
        ydim = cdim = (w, h, mcu_cols * 8, mcu_rows * 8)

    def plane(c, dims):
        pw, ph, padw, padh = dims
        xs = np.minimum(np.arange(padw), pw - 1)
        ys = np.minimum(np.arange(padh), ph - 1)
        return ((s2 + (7 + 5 * c) * ys[:, None] + (11 + 2 * c) * xs[None, :]
                 + 31 * c) % 256).astype(np.float64)

    planes = [plane(0, ydim), plane(1, cdim), plane(2, cdim)]

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

    marker(0xc0)
    w16(8 + 9)
    w8(8); w16(h); w16(w); w8(3)
    w8(1); w8(0x22 if c420 else 0x11); w8(0)
    w8(2); w8(0x11); w8(1)
    w8(3); w8(0x11); w8(1)

    huffs = [(0, 0, DC_LUMA), (1, 0, AC_LUMA),
             (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    marker(0xc4)
    w16(2 + sum(17 + len(t[1]) for _, _, t in huffs))
    for cls, tid, (bits, vals) in huffs:
        w8(cls << 4 | tid)
        for b in bits:
            w8(b)
        for v in vals:
            w8(v)

    marker(0xdd)
    w16(4); w16(ri)

    marker(0xda)
    w16(6 + 6)
    w8(3)
    w8(1); w8(0x00)
    w8(2); w8(0x11)
    w8(3); w8(0x11)
    w8(0); w8(63); w8(0)

    bwr = BitWriter(out)
    pred = [0, 0, 0]
    recon = [np.zeros_like(p) for p in planes]

    def emit(c, bx, by):
        tsel = 0 if c == 0 else 1
        q = Q_LUMA if c == 0 else Q_CHROMA
        blk = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
        coef = C @ blk @ C.T
        sq = np.floor(coef / q + 0.5).astype(np.int64)
        zz = sq.reshape(64)[ZIGZAG]
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
        idct = C.T @ (sq * q) @ C
        recon[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
            np.clip(np.floor(idct + 128.5), 0, 255)

    total = mcu_cols * mcu_rows
    done = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if c420:
                for v in range(2):
                    for u in range(2):
                        emit(0, mx * 2 + u, my * 2 + v)
                emit(1, mx, my)
                emit(2, mx, my)
            else:
                for c in range(3):
                    emit(c, mx, my)
            done += 1
            if done % ri == 0 and done < total:
                bwr.flush()
                marker(0xd0 + (rst % 8))
                rst += 1
                pred[0] = pred[1] = pred[2] = 0
    bwr.flush()
    marker(0xd9)

    blob = bytes(out)
    dims = [(w, h), (cw, ch), (cw, ch)]
    sums = [int(recon[c][:dims[c][1], :dims[c][0]].sum()) for c in range(3)]
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
                rows[key] = jpeg_rst_stats(*seeds(text))
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
    pq.write_table(table, out / "media_jpeg_rst_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'media_jpeg_rst_oracle.parquet'}")


if __name__ == "__main__":
    main()
