#!/usr/bin/env python3
"""Build the bzip2 fixtures.

CPython's bz2 module (libbzip2 behind it) is the INDEPENDENT encoder
the engine's from-scratch decoder (sources/Bzip2.scala) is pinned
against, exactly as CPython tarfile pins the tar walk.

Two outputs:
  fixtures/bz2_golden.parquet   (name, payload BLOB, bz BLOB)
      -> Bzip2Spec decodes bz and must reproduce payload byte-for-byte;
         shapes chosen to exercise every decode stage: RLE1 runs (>4
         and >259), the full byte alphabet (16x16 used map), multi-
         block streams (level 1, >100k input), concatenated streams,
         and high-entropy input (Huffman group switching).
  fixtures/bz2_blobs.parquet    (blob_key, bz BLOB)
      -> q238's engine input: per-document payloads (recomputable in
         SQL from the documents table) compressed by CPython at
         level 9; keyed like the other content fixtures.
  fixtures/tarbz2_blobs.parquet (blob_key, bz BLOB)
      -> q239's engine input: CPython tarfile 'w:bz2' archives (ustar
         format), two members per document — BOTH layers written by
         the independent implementation.

Usage: python3 scripts/make_bz2_fixture.py
"""
import bz2
import hashlib
import io
import tarfile
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def payload_for(text, n_chars, doc_id):
    # md5-hex body + a '!' run: the run exercises bzip2's final RLE
    return (hashlib.md5((text or "").encode("utf-8")).hexdigest()
            * (1 + n_chars % 5) + "!" * (doc_id % 300)).encode("ascii")


def golden():
    rows = []

    def add(name, payload, level=9):
        rows.append({"name": name, "payload": payload,
                     "bz": bz2.compress(payload, level)})

    add("one_byte", b"x")
    add("short_text", b"the quick brown fox jumps over the lazy dog")
    add("run_short", b"head" + b"a" * 7 + b"tail")          # RLE1 4+3
    add("run_long", b"A" * 1000 + b"B" + b"C" * 300)         # count>255 splits
    add("all_bytes", bytes(range(256)) * 40)                 # full used map
    add("high_entropy", bytes((i * 197 + (i * i) % 251) % 256
                              for i in range(60000)))        # group switching
    add("multi_block", (b"block cycling payload %d|" * 12000)
        % tuple(range(12000)), level=1)                      # >100k at level 1
    rows.append({"name": "two_streams",
                 "payload": b"first stream" + b"second!",
                 "bz": bz2.compress(b"first stream") + bz2.compress(b"second!")})
    pq.write_table(
        pa.table({
            "name": [r["name"] for r in rows],
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
            "bz": pa.array([r["bz"] for r in rows], pa.binary()),
        }),
        Path("fixtures") / "bz2_golden.parquet",
    )
    print(f"golden: {len(rows)} cases, "
          f"{sum(len(r['bz']) for r in rows)} compressed bytes")


def corpora():
    blobs = {}
    tars = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}' ORDER BY doc_id"
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            payload = payload_for(text, n_chars, doc_id)
            key = hashlib.md5(b"bz2:" + payload).hexdigest()
            if key not in blobs:
                blobs[key] = bz2.compress(payload, 9)
            if key not in tars:
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w:bz2",
                                  format=tarfile.USTAR_FORMAT) as tf:
                    for member, data in (
                            ("doc.txt", payload),
                            ("meta.json",
                             b'{"id": %d}' % doc_id)):
                        ti = tarfile.TarInfo(member)
                        ti.size = len(data)
                        ti.mtime = doc_id * 37 % 1000000
                        tf.addfile(ti, io.BytesIO(data))
                tars[key] = buf.getvalue()
    for fname, d in (("bz2_blobs.parquet", blobs),
                     ("tarbz2_blobs.parquet", tars)):
        keys = sorted(d)
        pq.write_table(
            pa.table({
                "blob_key": keys,
                "bz": pa.array([d[k] for k in keys], pa.binary()),
            }),
            Path("fixtures") / fname,
        )
        print(f"{fname}: {len(keys)} blobs, "
              f"{sum(len(v) for v in d.values())} bytes")


if __name__ == "__main__":
    golden()
    corpora()
