#!/usr/bin/env python3
"""Build the q263 parquet PAGE INDEX fixture.

The page index (PARQUET-922: ColumnIndex + OffsetIndex, the
footer-adjacent structs ColumnChunk points at via
column_index_offset / offset_index_offset) is what real engines use to
skip INSIDE a surviving row group: per-page min/max bounds select
pages, per-page offsets address them directly. q249 proved row-group
skipping from footer statistics; q263 is the same proof one level
finer — the engine must decode ONLY the pages the index justifies and
still reproduce the relational answer.

Layout control: use_dictionary=False (pages self-contained — a page
read out of sequence has no dictionary context), write_batch_size=256
with data_page_size=1 (every 256-row batch closes its page, so page p
holds rows [256p, 256p+255] in doc_id order — the "writer's page-size
arithmetic" the oracle replays relationally), write_page_index=True.

One file per table (documents bucketed doc_id % 6, rows sorted by
doc_id; rec_id = doc_id, score = (doc_id % 48) / 8.0). The probe
threshold T = chunk_min + (chunk_max - chunk_min) // 2 is derived from
the file's OWN footer statistics, so the whole skip decision is
self-contained per file (the at-scale pattern: no driver pass).

Usage: python3 scripts/make_parquet_pageindex_fixture.py
Writes: fixtures/parquet_pageindex_files.parquet
        (blob_key, rel_path, kind, file_bytes)
"""
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("score", pa.float64(), nullable=False),
])


def data_file(ids):
    t = pa.table(
        {"rec_id": ids, "score": [(d % 48) / 8.0 for d in ids]},
        schema=SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(
        t, buf,
        compression="snappy",
        use_dictionary=False,
        write_statistics=True,
        write_page_index=True,
        data_page_size=1,        # close a page at every batch
        write_batch_size=16,     # -> pages of exactly 16 rows
        data_page_version="1.0",
    )
    return buf.getvalue()


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
        for table_id, ids in sorted(blobs.items()):
            key = hashlib.md5(
                ("pageindex:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            files[key] = [("data-0.parquet", "data", data_file(ids))]
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
        out / "parquet_pageindex_files.parquet",
    )
    print(f"parquet_pageindex_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
