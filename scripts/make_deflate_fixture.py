#!/usr/bin/env python3
"""Build the q190 deflate-size oracle fixture.

No SQL engine ships zlib, so the q190 oracle joins documents to a
precomputed table of deflate sizes. The fixture is generated HERE with
CPython's zlib (an implementation independent of the engine's JVM
Deflater — both wrap canonical zlib, and level-6 output sizes were
verified byte-identical across the two before this fixture existed),
keyed by md5(text) so the same file serves every sf dir whose texts it
covers.

Usage: python3 scripts/make_deflate_fixture.py
Writes: fixtures/deflate_oracle.parquet  (text_md5, raw_bytes, deflate_bytes)
"""
import hashlib
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def deflate_len(text: str) -> int:
    b = (text or "").encode("utf-8")
    if not b:
        return 0
    c = zlib.compressobj(6)
    return len(c.compress(b) + c.flush())


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        for (text,) in duckdb.sql(f"SELECT text FROM '{p}'").fetchall():
            b = (text or "").encode("utf-8")
            key = hashlib.md5(b).hexdigest()
            if key not in rows:
                rows[key] = (len(b), deflate_len(text))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    table = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "raw_bytes": pa.array([rows[k][0] for k in keys], pa.int32()),
        "deflate_bytes": pa.array([rows[k][1] for k in keys], pa.int32()),
    })
    pq.write_table(table, out / "deflate_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'deflate_oracle.parquet'}")


if __name__ == "__main__":
    main()
