#!/usr/bin/env python3
"""Build the q199/q200 full-pixel-decode oracle fixture.

No SQL engine ships zlib-inflate or a GIF LZW expander, so (q190
precedent) the q199/q200 oracles join documents to a precomputed table
of per-image channel sums and top-left pixels. The fixture is generated
HERE by reimplementing MediaGen's derivation spec DIRECTLY in Python —
md5(text) -> (hash60, hash56) seeds -> per-pixel channel formulas — with
NO PNG or GIF bytes anywhere in the loop. That independence is the
point: the Spark side goes text -> encodePngRgb/encodeGifRgb ->
deflate/LZW -> parse -> sums, so a hash match proves the engine's whole
encode->compress->decode->fold chain is the identity on real compressed
payloads. This script and graft.queries.MediaGen must stay in lockstep
(the derivation is pinned by the fixture-backed oracles).

Keyed by md5(text) so one file serves every sf dir whose texts it
covers. Null text hashes as the empty string, matching the queries'
coalesce(text, '').

Usage: python3 scripts/make_media_fixture.py
Writes: fixtures/media_pixels_oracle.parquet
        (text_md5, png_* , gif_* : width/height int32, sums int64,
         top-left channels int32)
"""
import hashlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

# MediaGen.gifPalette: 64 entries, ((4i+1)%256, (7i+3)%256, (13i+5)%256)
GIF_PALETTE = [((i * 4 + 1) % 256, (i * 7 + 3) % 256, (i * 13 + 5) % 256)
               for i in range(64)]


def seeds(text: str):
    """MediaGen.seeds: hash60 = md5 hex[0:15), hash56 = hex[15:29)."""
    hexd = hashlib.md5((text or "").encode("utf-8")).hexdigest()
    return int(hexd[0:15], 16), int(hexd[15:29], 16)


def png_stats(s1: int, s2: int):
    """MediaGen.pngFor's pixel derivation: 2-16 x 5-12 truecolor."""
    w = 2 + s1 % 15
    h = 5 + s2 % 8
    sr = sg = sb = 0
    tl = None
    for y in range(h):
        for x in range(w):
            r = (s1 + 7 * y + 11 * x) % 256
            g = (s2 + 13 * y + 3 * x + 101) % 256
            b = (s1 + s2 + 5 * y + 17 * x + 202) % 256
            if tl is None:
                tl = (r, g, b)
            sr += r
            sg += g
            sb += b
    return w, h, sr, sg, sb, tl


def gif_stats(s1: int, s2: int):
    """MediaGen.gifFor's pixel derivation: 8-32 x 8-24 over the shared
    64-color palette."""
    w = 8 + s1 % 25
    h = 8 + s2 % 17
    sr = sg = sb = 0
    tl = None
    for y in range(h):
        for x in range(w):
            r, g, b = GIF_PALETTE[(s1 + 7 * y + 11 * x) % 64]
            if tl is None:
                tl = (r, g, b)
            sr += r
            sg += g
            sb += b
    return w, h, sr, sg, sb, tl


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
            s1, s2 = seeds(text)
            rows[key] = (png_stats(s1, s2), gif_stats(s1, s2))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)

    def col(pick, typ):
        return pa.array([pick(rows[k]) for k in keys], typ)

    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "png_width": col(lambda r: r[0][0], pa.int32()),
        "png_height": col(lambda r: r[0][1], pa.int32()),
        "png_sum_r": col(lambda r: r[0][2], pa.int64()),
        "png_sum_g": col(lambda r: r[0][3], pa.int64()),
        "png_sum_b": col(lambda r: r[0][4], pa.int64()),
        "png_tl_r": col(lambda r: r[0][5][0], pa.int32()),
        "png_tl_g": col(lambda r: r[0][5][1], pa.int32()),
        "png_tl_b": col(lambda r: r[0][5][2], pa.int32()),
        "gif_width": col(lambda r: r[1][0], pa.int32()),
        "gif_height": col(lambda r: r[1][1], pa.int32()),
        "gif_sum_r": col(lambda r: r[1][2], pa.int64()),
        "gif_sum_g": col(lambda r: r[1][3], pa.int64()),
        "gif_sum_b": col(lambda r: r[1][4], pa.int64()),
        "gif_tl_r": col(lambda r: r[1][5][0], pa.int32()),
        "gif_tl_g": col(lambda r: r[1][5][1], pa.int32()),
        "gif_tl_b": col(lambda r: r[1][5][2], pa.int32()),
    })
    pq.write_table(table, out / "media_pixels_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'media_pixels_oracle.parquet'}")


if __name__ == "__main__":
    main()
