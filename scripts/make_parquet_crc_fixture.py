#!/usr/bin/env python3
"""Build the q273 parquet PAGE CHECKSUM fixture.

Every page header can carry a CRC-32 over the bytes after it (the
compressed data; levels + values for v2) — parquet.thrift's `crc`
field, written by parquet-mr by default and by pyarrow with
write_page_checksum. On an UNCOMPRESSED PLAIN page a flipped value
byte decodes SILENTLY into a wrong sum — no codec breaks, no framing
trips — and the checksum is the ONLY thing that catches it. That is
exactly the 100 TB story: bit rot on petabyte archives is routine,
and a reader that ignores recorded checksums corrupts aggregates
without a trace.

Per table (documents doc_id % 6): a CLEAN uncompressed blob
(rec_id = doc_id, tok = doc_id % 1000, PLAIN, page CRCs on) and a
CORRUPT twin — one byte deep inside the first data page's values
region XORed, footer untouched. The engine must decode the clean blob
exactly and REFUSE the corrupt one at the checksum; an engine without
CRC verification returns a wrong id_sum and fails the oracle.

Usage: python3 scripts/make_parquet_crc_fixture.py
Writes: fixtures/parquet_crc_files.parquet
        (blob_key, variant, file_bytes)
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
    pa.field("tok", pa.int64(), nullable=False),
])


def data_file(ids):
    t = pa.table(
        {"rec_id": ids, "tok": [d % 1000 for d in ids]},
        schema=SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=False,
                   write_statistics=True, write_page_checksum=True,
                   data_page_version="1.0")
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
                ("pqcrc:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            clean = data_file(ids)
            f = pq.ParquetFile(io.BytesIO(clean))
            col0 = f.metadata.row_group(0).column(0)
            off = col0.data_page_offset
            end = off + col0.total_compressed_size
            corrupt = bytearray(clean)
            # near the END of the first column's page: safely inside
            # the PLAIN values region (headers sit at the front)
            corrupt[end - 12] ^= 0x40
            files[key] = [("clean", clean), ("corrupt", bytes(corrupt))]
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys, variants, blobs_col = [], [], []
    for k in sorted(files):
        for variant, b in files[k]:
            keys.append(k)
            variants.append(variant)
            blobs_col.append(b)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "variant": variants,
            "file_bytes": pa.array(blobs_col, pa.binary()),
        }),
        out / "parquet_crc_files.parquet",
    )
    print(f"parquet_crc_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables")


if __name__ == "__main__":
    main()
