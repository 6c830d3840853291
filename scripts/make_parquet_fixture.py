#!/usr/bin/env python3
"""Build the q234/q235 parquet-walk fixtures.

The engine's parquet footer walk (sources/Parquet.scala) reads OTHER
systems' parquet files at byte level — trailer, thrift-compact
FileMetaData, page headers, plain-encoded pages. The independent writer
here is pyarrow (parquet-cpp): it writes real files with controlled
options, and its C++ metadata API provides the expected values the
engine's reader must reproduce.

Two fixtures, with DISJOINT roles so neither side can cheat:
  fixtures/parquet_files.parquet        (blob_key, file_bytes)
      -> the ENGINE's input: raw bytes only, no metadata.
  fixtures/parquet_meta_oracle.parquet  (blob_key, rg_idx, col_idx, ...)
      -> the ORACLE's claims: pyarrow's metadata API values only,
         no bytes.

Blob grouping mirrors q230's Avro fixture: documents bucket by
doc_id % 6; even buckets gzip-compressed, odd uncompressed; the row
group count varies 1..3 by bucket. Keys are md5 over codec + the
doc_id=payload list (CONTENT, not ids — sf dirs reuse doc_id lists
with different texts).

Usage: python3 scripts/make_parquet_fixture.py
"""
import hashlib
import io
import math
import struct
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("payload", pa.string(), nullable=False),
    pa.field("score", pa.float64(), nullable=False),
])

CODEC_IDS = {"UNCOMPRESSED": 0, "GZIP": 2}
PHYS_IDS = {"INT64": 2, "DOUBLE": 5, "BYTE_ARRAY": 6}


def build(recs, codec, n_groups):
    t = pa.table(
        {
            "rec_id": [r[0] for r in recs],
            "payload": [r[1] for r in recs],
            "score": [r[2] for r in recs],
        },
        schema=SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        compression=codec,
        use_dictionary=False,
        row_group_size=max(1, math.ceil(len(recs) / n_groups)),
        write_statistics=True,
        data_page_version="1.0",
    )
    return buf.getvalue()


def main():
    files = {}
    meta_rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}' ORDER BY doc_id"
        blobs = {}
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            payload = hashlib.md5((text or "").encode("utf-8")).hexdigest() \
                * (1 + n_chars % 3)
            score = (doc_id % 1000) / 4.0  # exact dyadic: order-free sums
            blobs.setdefault(doc_id % 6, []).append((doc_id, payload, score))
        for blob_id, recs in sorted(blobs.items()):
            codec = "gzip" if blob_id % 2 == 0 else "none"
            key = hashlib.md5(
                ("parquet:" + codec + ":" +
                 ",".join(f"{r[0]}={r[1]}" for r in recs)).encode()
            ).hexdigest()
            if key in files:
                continue
            b = build(recs, codec, 1 + blob_id % 3)
            files[key] = b
            md = pq.ParquetFile(io.BytesIO(b)).metadata
            # the trailer length IS the thrift FileMetaData length —
            # keep the fixture honest about that equivalence
            assert struct.unpack("<I", b[-8:-4])[0] == md.serialized_size
            rows = []
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    rows.append({
                        "blob_key": key,
                        "rg_idx": rg,
                        "col_idx": ci,
                        "col_path": c.path_in_schema,
                        "phys_type": PHYS_IDS[c.physical_type],
                        "codec": CODEC_IDS[c.compression],
                        "num_values": c.num_values,
                        "data_page_offset": c.data_page_offset,
                        "dict_page_offset": c.dictionary_page_offset
                        if c.has_dictionary_page else -1,
                        "total_compressed_size": c.total_compressed_size,
                        "total_uncompressed_size": c.total_uncompressed_size,
                        "rg_num_rows": g.num_rows,
                        "file_rows": md.num_rows,
                        "version": 2,  # thrift int behind format_version 2.x
                        "created_by": md.created_by,
                        "footer_len": md.serialized_size,
                        "n_cols": md.num_columns,
                        "n_row_groups": md.num_row_groups,
                        "file_size": len(b),
                    })
            meta_rows[key] = rows

    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_bytes": pa.array([files[k] for k in keys], pa.binary()),
        }),
        out / "parquet_files.parquet",
    )
    flat = [r for k in keys for r in meta_rows[k]]
    pq.write_table(
        pa.table({f: [r[f] for r in flat] for f in flat[0]}),
        out / "parquet_meta_oracle.parquet",
    )
    print(f"wrote {len(keys)} files "
          f"({sum(len(v) for v in files.values())} bytes), "
          f"{len(flat)} meta rows")


if __name__ == "__main__":
    main()
