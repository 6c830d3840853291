#!/usr/bin/env python3
"""Build the q222 tar.gz member-length oracle fixture.

q222 chains the two container layers dataset dumps actually ship in:
a ustar archive (engine writer == CPython tarfile, verified
byte-identical up to tarfile's 10240-byte blocking pad) wrapped in a
single gzip member. DuckDB cannot deflate, so — q190/q217 precedent —
the compressed size is precomputed HERE with CPython zlib (canonical
zlib, same library the JVM Deflater wraps; level-6 output verified
byte-identical between the two). The tar bytes are rebuilt with
CPython's OWN tarfile (an independent ustar writer), truncated to the
engine writer's two-zero-block length; everything else about the gzip
member arithmetic (10-byte header + FNAME + NUL + deflate + 8-byte
trailer) stays visible in the oracle SQL.

Keyed by md5(text) like the other media fixtures.

Usage: python3 scripts/make_targz_fixture.py
Writes: fixtures/targz_oracle.parquet  (text_md5, deflate_len)
"""
import hashlib
import io
import tarfile
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def tar_bytes(doc_id: int, text: str, n_chars: int) -> bytes:
    pd = hashlib.md5((text or "").encode("utf-8")).hexdigest()
    pm = hashlib.md5(((text or "") + ":meta").encode("utf-8")).hexdigest()
    k = 1 + n_chars % 4
    s1 = int(hashlib.md5((text or "").encode("utf-8")).hexdigest()[0:15], 16)
    mt = s1 % (1 << 30)
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    for name, data, m in [("doc.txt", (pd * k).encode("ascii"), mt),
                          ("meta.json", pm.encode("ascii"), mt + 1)]:
        i = tarfile.TarInfo(name)
        i.size = len(data)
        i.mtime = m
        tf.addfile(i, io.BytesIO(data))
    tf.close()
    # engine writer stops after the two zero blocks; tarfile pads to its
    # 10240-byte blocking factor. Truncate to the engine's length:
    # 2 headers + padded payloads + 1024-byte terminator.
    own_len = 512 + 512 + 512 + 512 + 1024  # payloads <= 128 B pad to 512
    out = buf.getvalue()
    assert set(out[own_len:]) <= {0}, "unexpected non-zero tail"
    return out[:own_len]


def deflate_len(b: bytes) -> int:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate, level 6
    return len(c.compress(b) + c.flush())


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}'"
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key not in rows:
                rows[key] = deflate_len(tar_bytes(doc_id, text, n_chars))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "deflate_len": pa.array([rows[k] for k in keys], pa.int32()),
    })
    pq.write_table(table, out / "targz_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'targz_oracle.parquet'}")


if __name__ == "__main__":
    main()
