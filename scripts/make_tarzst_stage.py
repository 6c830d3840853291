#!/usr/bin/env python3
"""Stage 1 of the q247 tar.zst fixture: CPython tarfile writes PLAIN
ustar archives (the INDEPENDENT tar writer, as in q216/q239) into
fixtures/tar_stage_blobs.parquet. Stage 2 is Scala-side
(graft.tools.MakeZstdFixture): libzstd (zstd-jni) compresses each
archive into fixtures/tarzst_blobs.parquet — so BOTH layers of the
.tar.zst come from independent reference implementations, and BOTH
decode layers under test are the engine's own (ZstdEntropy -> Tar).

Usage: python3 scripts/make_tarzst_stage.py
"""
import hashlib
import io
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
    tars = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}' ORDER BY doc_id"
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            payload = payload_for(text, n_chars, doc_id)
            key = hashlib.md5(b"tarzst:" + payload).hexdigest()
            if key in tars:
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
            tars[key] = buf.getvalue()
    keys = sorted(tars)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "tar": pa.array([tars[k] for k in keys], pa.binary()),
        }),
        Path("fixtures") / "tar_stage_blobs.parquet",
    )
    print(f"tar_stage_blobs.parquet: {len(keys)} blobs, "
          f"{sum(len(v) for v in tars.values())} bytes")


if __name__ == "__main__":
    main()
