#!/usr/bin/env python3
"""Build the q283 Hudi COPY-ON-WRITE timeline fixture.

Hudi (hudi.apache.org, table format docs) keeps table state as a
TIMELINE under `.hoodie/`: completed commits are `<instant>.commit`
JSON files whose partitionToWriteStats lists the file slices each
commit wrote. Data files are named `<fileId>_<writeToken>_<instant>
.parquet`; copy-on-write rewrites a whole file group per update, so
the live view = for every fileId, the slice with the LATEST instant
that belongs to a COMPLETED commit.

The two baits:
  - fg0 is rewritten by a completed commit (instant 2): a reader that
    does not last-wins by fileId double-counts it;
  - fg1 has a newer slice from an INFLIGHT instant (3, present as
    `.inflight`, never completed) with poisoned values: a
    listing-based reader that takes the newest file reads
    UNCOMMITTED data and the val sum breaks.

Values: rec_id = doc_id, val = (doc_id * 13) % 1000 (+5 in fg0's
rewrite, +999 poison in the inflight slice) — fully relational.

Usage: python3 scripts/make_hudi_fixture.py
Writes: fixtures/hudi_files.parquet
"""
import hashlib
import io
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]


def val(d):
    return (d * 13) % 1000


def data_file(ids, bump=0):
    schema = pa.schema([
        pa.field("rec_id", pa.int64(), nullable=False),
        pa.field("val", pa.int64(), nullable=False),
    ])
    t = pa.table({"rec_id": ids, "val": [val(d) + bump for d in ids]},
                 schema=schema)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def commit_json(stats):
    # stats: list of (fileId, path, numWrites)
    return json.dumps({
        "partitionToWriteStats": {"p": [
            {"fileId": fid, "path": path, "numWrites": n,
             "numDeletes": 0, "numUpdateWrites": 0}
            for fid, path, n in stats]},
        "operation": "UPSERT",
    }, sort_keys=True).encode("utf-8")


def main():
    files = {}
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
                ("hudi:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            fg = {x: [d for d in ids if (d // 6) % 2 == x]
                  for x in range(2)}
            t1, t2, t3 = ("00000000000001", "00000000000002",
                          "00000000000003")

            def dname(fid, instant):
                return f"p/{fid}_0-0-0_{instant}.parquet"

            fg0_v1 = data_file(fg[0])
            fg1_v1 = data_file(fg[1])
            fg0_v2 = data_file(fg[0], bump=5)      # completed rewrite
            fg1_v3 = data_file(fg[1], bump=999)    # INFLIGHT poison
            rows = [
                (f".hoodie/{t1}.commit", "timeline", commit_json([
                    ("fg0", dname("fg0", t1), len(fg[0])),
                    ("fg1", dname("fg1", t1), len(fg[1]))])),
                (f".hoodie/{t2}.commit", "timeline", commit_json([
                    ("fg0", dname("fg0", t2), len(fg[0]))])),
                # instant 3 never completes: only the inflight marker
                (f".hoodie/{t3}.inflight", "timeline", b"{}"),
                (dname("fg0", t1), "data", fg0_v1),
                (dname("fg1", t1), "data", fg1_v1),
                (dname("fg0", t2), "data", fg0_v2),
                (dname("fg1", t3), "data", fg1_v3),
            ]
            files[key] = rows
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys, paths, kinds, blobs_col = [], [], [], []
    for k in sorted(files):
        for rel_path, kind, b in files[k]:
            keys.append(k)
            paths.append(rel_path)
            kinds.append(kind)
            blobs_col.append(b)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": paths,
            "kind": kinds,
            "file_bytes": pa.array(blobs_col, pa.binary()),
        }),
        out / "hudi_files.parquet",
    )
    print(f"hudi_files.parquet: {len(keys)} rows, {len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
