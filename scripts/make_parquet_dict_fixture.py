#!/usr/bin/env python3
"""Build the q240/q241 parquet dictionary/snappy/v2 fixtures.

Round 10's parquet fixture (make_parquet_fixture.py) had to be written
with use_dictionary=False because the engine only decoded PLAIN pages.
Real lakes are overwhelmingly dictionary-encoded snappy — BOTH pyarrow
and Spark default to dictionary encoding, and snappy is both writers'
default codec. These fixtures are the pyarrow-DEFAULT layouts:

  fixtures/parquet_dict_files.parquet   (blob_key, file_bytes)
      q240: v1 data pages, full codec x encoding matrix
            (snappy/gzip/none x dictionary/plain by bucket)
  fixtures/parquet_v2_files.parquet     (blob_key, file_bytes)
      q241: DATA_PAGE_V2 pages (levels outside the codec, explicit
            num_nulls, is_compressed flag), same matrix

The engine gets raw bytes ONLY. The oracle recomputes every sum
relationally from the documents table (plus octet_length of the blob
itself) — no metadata sidecar, so the decode is proven end to end.

Schema (per doc, bucketed by doc_id % 6, row groups 1 + bucket % 3):
  rec_id  int64  REQUIRED  = doc_id
  payload string NULLABLE  = NULL when doc_id % 13 == 0, else
                             ('c' + str((doc_id // 60) % 7)) repeated
                             (1 + n_chars % 3) times
      -> 21 distinct values (a REAL dictionary: RLE runs from the
         doc_id//60 plateaus, bit-packed scatter from the repeat factor)
  score  double REQUIRED   = (doc_id % 16) / 4.0  (exact dyadic:
                             order-free sums, 16-entry dictionary)

Usage: python3 scripts/make_parquet_dict_fixture.py
"""
import hashlib
import io
import math
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("payload", pa.string(), nullable=True),
    pa.field("score", pa.float64(), nullable=False),
])

CODECS = ["snappy", "gzip", "none"]


def build(recs, codec, use_dict, n_groups, page_version,
          column_encoding=None):
    t = pa.table(
        {
            "rec_id": [r[0] for r in recs],
            "payload": [r[1] for r in recs],
            "score": [r[2] for r in recs],
        },
        schema=SCHEMA,
    )
    buf = io.BytesIO()
    kwargs = {}
    if column_encoding is not None:
        kwargs["column_encoding"] = column_encoding
    pq.write_table(
        t,
        buf,
        compression=codec,
        use_dictionary=use_dict,
        row_group_size=max(1, math.ceil(len(recs) / n_groups)),
        write_statistics=True,
        data_page_version=page_version,
        **kwargs,
    )
    return buf.getvalue()


def payload_of(doc_id, n_chars):
    if doc_id % 13 == 0:
        return None
    return ("c" + str((doc_id // 60) % 7)) * (1 + n_chars % 3)


TYPED_SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("flag", pa.bool_(), nullable=False),
    pa.field("cnt", pa.int32(), nullable=False),
    pa.field("ratio", pa.float32(), nullable=False),
    pa.field("day", pa.date32(), nullable=False),
])


def build_typed(doc_ids, codec, n_groups):
    import datetime
    epoch = datetime.date(2020, 1, 1)
    t = pa.table(
        {
            "rec_id": doc_ids,
            "flag": [d % 3 == 0 for d in doc_ids],
            "cnt": [int(d % 1000) - 300 for d in doc_ids],
            "ratio": [(d % 64) / 8.0 for d in doc_ids],
            "day": [epoch + datetime.timedelta(days=int(d % 3000))
                    for d in doc_ids],
        },
        schema=TYPED_SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        compression=codec,
        row_group_size=max(1, math.ceil(len(doc_ids) / n_groups)),
        write_statistics=True,
        data_page_version="1.0",
    )
    return buf.getvalue()


def typed_main():
    """q246: the OTHER half of a real lake schema — flags, int32
    counters, float ratios, date32 days — pyarrow defaults (dictionary
    where applicable; booleans stay bit-packed PLAIN), snappy.
    All values derive from doc_id alone, so the key covers the doc_id
    list (same list => same bytes, dedup-safe across sf dirs)."""
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
                ("parquettyped:snappy:" +
                 ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            files[key] = build_typed(ids, "snappy", 1 + blob_id % 3)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_bytes": pa.array([files[k] for k in keys], pa.binary()),
        }),
        out / "parquet_typed_files.parquet",
    )
    print(f"parquet_typed_files.parquet: {len(keys)} files "
          f"({sum(len(v) for v in files.values())} bytes)")


LIST_SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    # embeddings shape: nullable list, REQUIRED float elements
    # (maxDef 2, maxRep 1)
    pa.field("emb", pa.list_(
        pa.field("element", pa.float32(), nullable=False)),
        nullable=True),
    # token-list shape: nullable list, NULLABLE int64 elements
    # (maxDef 3, maxRep 1)
    pa.field("toks", pa.list_(
        pa.field("element", pa.int64(), nullable=True)),
        nullable=True),
])


def emb_of(d):
    """doc_id % 13 == 0 -> NULL list; % 11 == 0 -> EMPTY list; else
    1 + d % 5 dyadic floats."""
    if d % 13 == 0:
        return None
    if d % 11 == 0:
        return []
    return [((d * 3 + j * 7) % 128) / 4.0 for j in range(1 + d % 5)]


def toks_of(d):
    """Same null/empty split; elements (d + j) % 1000, with element j
    NULL when (d + j) % 17 == 0 — exercises def level 2 of 3."""
    if d % 13 == 0:
        return None
    if d % 11 == 0:
        return []
    return [None if (d + j) % 17 == 0 else (d + j) % 1000
            for j in range(1 + d % 7)]


def build_list(doc_ids, n_groups, page_version):
    t = pa.table(
        {
            "rec_id": doc_ids,
            "emb": [emb_of(d) for d in doc_ids],
            "toks": [toks_of(d) for d in doc_ids],
        },
        schema=LIST_SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        compression="snappy",
        row_group_size=max(1, math.ceil(len(doc_ids) / n_groups)),
        write_statistics=True,
        data_page_version=page_version,
    )
    return buf.getvalue()


def list_main():
    """q255: LIST columns — the 3-level layout embedding arrays and
    token lists actually ship in. pyarrow defaults (dictionary,
    snappy); v1 pages for buckets 0-2, DATA_PAGE_V2 for 3-5 (rep
    levels inside vs outside the codec)."""
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
                ("parquetlist:snappy:" +
                 ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            pv = "1.0" if blob_id % 6 < 3 else "2.0"
            files[key] = build_list(ids, 1 + blob_id % 3, pv)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_bytes": pa.array([files[k] for k in keys], pa.binary()),
        }),
        out / "parquet_list_files.parquet",
    )
    print(f"parquet_list_files.parquet: {len(keys)} files "
          f"({sum(len(v) for v in files.values())} bytes)")


DEC_SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    # 18,2 -> 8-byte FLBA; 38,4 -> 16-byte FLBA (sign-extension path)
    pa.field("price", pa.decimal128(18, 2), nullable=False),
    pa.field("big", pa.decimal128(38, 4), nullable=False),
    pa.field("ts", pa.timestamp("us"), nullable=False),
])


def build_dec(doc_ids, n_groups):
    import datetime
    import decimal
    epoch = datetime.datetime(1970, 1, 1)
    t = pa.table(
        {
            "rec_id": doc_ids,
            "price": [decimal.Decimal(int(d % 100000))
                      .scaleb(-2) for d in doc_ids],
            "big": [decimal.Decimal(int(d % 1000000) - 500000)
                    .scaleb(-4) for d in doc_ids],
            "ts": [epoch + datetime.timedelta(
                seconds=1577836800 + int(d % 100000))
                for d in doc_ids],
        },
        schema=DEC_SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        compression="snappy",
        row_group_size=max(1, math.ceil(len(doc_ids) / n_groups)),
        write_statistics=True,
        data_page_version="1.0",
        use_deprecated_int96_timestamps=True,  # the legacy Spark layout
    )
    return buf.getvalue()


def dec_main():
    """q260: the WAREHOUSE types — FLBA decimals (8- and 16-byte
    two's complement, negatives included) and INT96 legacy
    timestamps, pyarrow defaults otherwise."""
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
                ("parquetdec:snappy:" +
                 ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            files[key] = build_dec(ids, 1 + blob_id % 3)
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys = sorted(files)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "file_bytes": pa.array([files[k] for k in keys], pa.binary()),
        }),
        out / "parquet_dec_files.parquet",
    )
    print(f"parquet_dec_files.parquet: {len(keys)} files "
          f"({sum(len(v) for v in files.values())} bytes)")


def main():
    typed_main()
    list_main()
    dec_main()
    # parquet_zstd_files (q251): page_version None = split by bucket
    # (0-2 v1, 3-5 v2) so the zstd codec crosses BOTH page layouts and
    # both encodings (dictionary by parity, as before). The key does
    # not encode the page version: bucket membership is a function of
    # the doc_id list, so identical recs always rebuild identical bytes.
    for page_version, tag, out_name, codecs in [
        ("1.0", "parquetdict1", "parquet_dict_files.parquet",
         CODECS),
        ("2.0", "parquetdict2", "parquet_v2_files.parquet",
         CODECS),
        (None, "parquetzstd", "parquet_zstd_files.parquet",
         ["zstd", "zstd", "zstd"]),
        # pyarrow 'lz4' stamps thrift codec LZ4_RAW (7): bare blocks
        (None, "parquetlz4", "parquet_lz4_files.parquet",
         ["lz4", "lz4", "lz4"]),
        # parquet_delta_files (q253): the v2 VALUE encodings —
        # DELTA_BINARY_PACKED ints, DELTA_BYTE_ARRAY strings on even
        # buckets / DELTA_LENGTH_BYTE_ARRAY on odd, BYTE_STREAM_SPLIT
        # doubles — across the same codec cycle and v1/v2 page split.
        # use_dictionary is OFF for all buckets (column_encoding
        # requires it); the key's parity digit selects the string
        # encoding instead of the dictionary flag.
        (None, "parquetdelta", "parquet_delta_files.parquet",
         CODECS),
    ]:
        files = {}
        for sf in SF_DIRS:
            p = Path("/root/testdata") / sf / "documents.parquet"
            if not p.exists():
                continue
            q = f"SELECT doc_id, n_chars FROM '{p}' ORDER BY doc_id"
            blobs = {}
            for doc_id, n_chars in duckdb.sql(q).fetchall():
                blobs.setdefault(doc_id % 6, []).append(
                    (doc_id, payload_of(doc_id, n_chars),
                     (doc_id % 16) / 4.0))
            for blob_id, recs in sorted(blobs.items()):
                codec = codecs[blob_id % 3]
                parity = blob_id % 2 == 0
                pv = page_version if page_version is not None else \
                    ("1.0" if blob_id % 6 < 3 else "2.0")
                if tag == "parquetdelta":
                    use_dict = False
                    enc = {
                        "rec_id": "DELTA_BINARY_PACKED",
                        "payload": "DELTA_BYTE_ARRAY" if parity
                        else "DELTA_LENGTH_BYTE_ARRAY",
                        "score": "BYTE_STREAM_SPLIT",
                    }
                else:
                    use_dict = parity
                    enc = None
                key = hashlib.md5(
                    (f"{tag}:{codec}:{int(parity)}:" +
                     ",".join(f"{r[0]}={r[1] if r[1] is not None else 'NULL'}"
                              for r in recs)).encode()
                ).hexdigest()
                if key in files:
                    continue
                files[key] = build(recs, codec, use_dict,
                                   1 + blob_id % 3, pv, enc)
        out = Path("fixtures")
        out.mkdir(exist_ok=True)
        keys = sorted(files)
        pq.write_table(
            pa.table({
                "blob_key": keys,
                "file_bytes": pa.array([files[k] for k in keys],
                                       pa.binary()),
            }),
            out / out_name,
        )
        print(f"{out_name}: {len(keys)} files "
              f"({sum(len(v) for v in files.values())} bytes)")


if __name__ == "__main__":
    main()
