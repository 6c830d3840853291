#!/usr/bin/env python3
"""Build the q302 Hudi table WRITE oracle.

q302's engine composes a copy-on-write table — slice-named data files
through its own parquet writer plus a canonical-JSON `.hoodie/`
timeline. This script reimplements the deterministic bundle
independently (json.dumps(sort_keys=True) for the commits, the q295
parquet twin for the data) and records md5(concat(path + NUL + bytes,
sorted)) per table.

Usage: python3 scripts/make_hudi_write_oracle.py
Writes: fixtures/hudi_write_oracle.parquet
"""
import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_parquet_writer_oracle import write_int64  # noqa: E402

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def commit_json(stats):
    return json.dumps({
        "operation": "UPSERT",
        "partitionToWriteStats": {"p": [
            {"fileId": f, "path": p, "numWrites": n,
             "numDeletes": 0, "numUpdateWrites": 0}
            for f, p, n in stats]},
    }, sort_keys=True)


def bundle_for(ids):
    fg = {x: [d for d in ids if (d // 6) % 2 == x] for x in range(2)}

    def data(p, bump):
        return write_int64(["rec_id", "val"],
                           [(d, (d * 13) % 1000 + bump) for d in p])

    t1, t2, t3 = "00000000000001", "00000000000002", "00000000000003"

    def dname(fid, instant):
        return f"p/{fid}_0-0-0_{instant}.parquet"

    files = {
        f".hoodie/{t1}.commit": commit_json([
            ("fg0", dname("fg0", t1), len(fg[0])),
            ("fg1", dname("fg1", t1), len(fg[1]))]).encode("utf-8"),
        f".hoodie/{t2}.commit": commit_json([
            ("fg0", dname("fg0", t2), len(fg[0]))]).encode("utf-8"),
        f".hoodie/{t3}.inflight": b"{}",
        dname("fg0", t1): data(fg[0], 0),
        dname("fg1", t1): data(fg[1], 0),
        dname("fg0", t2): data(fg[0], 5),
        dname("fg1", t3): data(fg[1], 999),
    }
    h = hashlib.md5()
    for p in sorted(files):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
        h.update(files[p])
    return h.hexdigest(), sum(len(b) for b in files.values())


def main():
    rows = {}
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
                ("hudiwrite:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key not in rows:
                rows[key] = bundle_for(ids)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "bundle_md5": [rows[k][0] for k in keys],
            "bundle_len": pa.array([rows[k][1] for k in keys],
                                   pa.int64()),
        }),
        out / "hudi_write_oracle.parquet",
    )
    print(f"hudi_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
