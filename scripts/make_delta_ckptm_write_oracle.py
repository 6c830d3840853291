#!/usr/bin/env python3
"""Build the q323 MULTI-PART Delta-checkpoint-WRITER byte oracle.

The engine splits its q314 checkpoint across two
`<v>.checkpoint.<part>.<parts>.parquet` files (part 1: protocol +
metaData + add A; part 2: add C + the remove-B tombstone) through the
same nested writer. This script reimplements both parts independently
(reusing the q314 twin's layout mirror) and records each table's
per-part md5s; pyarrow re-reads both parts.

Usage: python3 scripts/make_delta_ckptm_write_oracle.py
Writes: fixtures/delta_ckptm_write_oracle.parquet (blob_key,
        part1_md5, part2_md5)
"""
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from make_delta_ckpt_write_oracle import act, write_checkpoint, \
    write_int64

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def blob_parts(bkey, ids):
    parts = [[d for d in ids if (d // 6) % 4 == x] for x in range(4)]
    sizes = [len(write_int64(["rec_id", "val"],
                             [(d, (d * 13) % 991) for d in p]))
             for p in parts]
    p1 = write_checkpoint([
        act(min_reader=1),
        act(meta_id=bkey),
        act(add_path="part-0.parquet", add_size=sizes[0], add_part="0"),
    ])
    p2 = write_checkpoint([
        act(add_path="part-2.parquet", add_size=sizes[2], add_part="2"),
        act(remove_path="part-1.parquet"),
    ])
    return p1, p2


def main():
    rows_out = {}
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
                ("deltackptmw:" + ",".join(str(d) for d in ids))
                .encode()).hexdigest()
            if key in rows_out:
                continue
            p1, p2 = blob_parts(key, ids)
            # independent reader on both parts
            t1 = pq.read_table(io.BytesIO(p1))
            assert t1.num_rows == 3
            assert [x and x["path"]
                    for x in t1.column("add").to_pylist()] == \
                [None, None, "part-0.parquet"]
            t2 = pq.read_table(io.BytesIO(p2))
            assert t2.num_rows == 2
            assert [x and x["path"]
                    for x in t2.column("remove").to_pylist()] == \
                [None, "part-1.parquet"]
            rows_out[key] = (hashlib.md5(p1).hexdigest(),
                             hashlib.md5(p2).hexdigest())
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(rows_out)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "part1_md5": [rows_out[k][0] for k in keys],
            "part2_md5": [rows_out[k][1] for k in keys],
        }),
        out / "delta_ckptm_write_oracle.parquet",
    )
    print(f"delta_ckptm_write_oracle.parquet: {len(keys)} rows")


if __name__ == "__main__":
    main()
