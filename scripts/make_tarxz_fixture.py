#!/usr/bin/env python3
"""Build the q306 tar.xz fixture: CPython tarfile writes PLAIN ustar
archives (the independent tar writer, q247's geometry) and liblzma
(python lzma) compresses each into a single-stream .xz — so BOTH
layers come from independent reference implementations, and BOTH
decode layers under test are the engine's own (Xz/Lzma2 -> Tar).

Usage: python3 scripts/make_tarxz_fixture.py
Writes: fixtures/tarxz_blobs.parquet (blob_key, xz)
"""
import hashlib
import io
import lzma
import tarfile
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def payload_for(text, n_chars, doc_id):
    return (hashlib.md5((text or "").encode("utf-8")).hexdigest()
            * (1 + n_chars % 5) + "!" * (doc_id % 300)).encode("ascii")


def main():
    out = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}' ORDER BY doc_id"
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            payload = payload_for(text, n_chars, doc_id)
            key = hashlib.md5(b"tarxz:" + payload).hexdigest()
            if key in out:
                continue
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w",
                              format=tarfile.USTAR_FORMAT) as tf:
                for member, data in (
                        ("doc.txt", payload),
                        ("meta.json", b'{"id": %d}' % doc_id)):
                    ti = tarfile.TarInfo(member)
                    ti.size = len(data)
                    ti.mtime = doc_id * 37 % 1000000
                    tf.addfile(ti, io.BytesIO(data))
            out[key] = lzma.compress(buf.getvalue(),
                                     format=lzma.FORMAT_XZ,
                                     check=lzma.CHECK_CRC32, preset=6)
    keys = sorted(out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "xz": pa.array([out[k] for k in keys], pa.binary()),
        }),
        Path("fixtures") / "tarxz_blobs.parquet",
    )
    print(f"tarxz_blobs.parquet: {len(keys)} blobs, "
          f"{sum(len(v) for v in out.values())} bytes")


if __name__ == "__main__":
    main()
