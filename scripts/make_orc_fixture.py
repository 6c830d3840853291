#!/usr/bin/env python3
"""Build the q264 ORC file-tail fixture.

ORC (public spec, orc.apache.org/specification/ORCv1) is the other
major columnar lake format: the file tail is postscript (last byte =
its length) -> chunk-compressed protobuf footer -> stripe directory +
type tree + per-column file statistics. The engine
(sources/Orc.scala) walks that tail from raw bytes with its own
protobuf cursor and decompresses the footer through its OWN codec
consumers — ORC's chunk framing is exercised across all four codecs
the format ships (ZLIB / SNAPPY / ZSTD / LZ4, one per table by
blob_id % 4).

Per table (documents bucketed doc_id % 6): each doc contributes 256
identical rows (rec_id = doc_id, score = (doc_id % 48) / 8.0, exact
dyadic — all stats sums are exact in double regardless of order), so
tables are big enough that stripe_size=1024 yields MULTIPLE stripes
and the stripe-directory walk (per-stripe row counts must tile the
footer total) is non-trivial.

n_stripes and content_length are NOT relationally derivable (liborc's
stripe flush is a buffering decision), so the fixture precomputes them
through pyarrow.orc — the INDEPENDENT reader — and the oracle joins
them; all typed statistics stay purely relational.

Usage: python3 scripts/make_orc_fixture.py
Writes: fixtures/orc_files.parquet
        (blob_key, rel_path, kind, file_bytes, n_stripes,
         content_length)
"""
import decimal
import hashlib
import io
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import orc

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
CODECS = ["ZLIB", "SNAPPY", "ZSTD", "LZ4"]
REPLICAS = 256


def orc_file(ids, codec):
    rows = sorted(ids * REPLICAS)
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "score": pa.array([(d % 48) / 8.0 for d in rows], pa.float64()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec, stripe_size=1024)
    return buf.getvalue()


def orc_str_file(ids, codec):
    # name: unique per row -> liborc picks DIRECT_V2; cat: 7 distinct
    # values -> DICTIONARY_V2. Both string encodings in one file.
    rows = sorted(ids * REPLICAS)
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "name": pa.array([f"doc-{d}-{i}" for i, d in enumerate(rows)],
                         pa.string()),
        "cat": pa.array([f"cat{d % 7}" for d in rows], pa.string()),
    })
    buf = io.BytesIO()
    # liborc defaults dictionary_key_size_threshold to 0 (dictionary
    # OFF); 0.5 lets the 7-value cat column dictionary-encode while
    # the unique name column stays DIRECT_V2
    # bloom filters on rec_id (long -> Wang mix) and name (string ->
    # Murmur3 hash64), one BloomFilter per row group (q276)
    orc.write_table(t, buf, compression=codec, stripe_size=4096,
                    dictionary_key_size_threshold=0.5,
                    bloom_filter_columns=[1, 2],
                    bloom_filter_fpp=0.02)
    return buf.getvalue()


def orc_null_file(ids, codec):
    # nullable val/tag columns -> liborc writes PRESENT streams
    # (Byte-RLE over MSB-first bit-packed validity) and value streams
    # holding ONLY the present values; nullness is a pure function of
    # doc_id so the q277 oracle derives everything relationally
    # null moduli 5 and 7 are coprime with the blob split (doc_id % 6)
    # so EVERY blob carries both nulls and values in both columns
    rows = sorted(ids * NULL_REPLICAS)
    val = [None if d % 5 == 0 else (d * 7) % 1000 for d in rows]
    tag = [None if d % 7 == 1 else f"tag{d % 5}" for d in rows]
    # pad: unique per row — the RLE'd null columns alone compress so
    # well liborc never flushes a stripe; the pad forces MULTIPLE
    # stripes so per-stripe PRESENT decode is non-trivial
    pad = [f"doc-{d}-{i}" for i, d in enumerate(rows)]
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "val": pa.array(val, pa.int64()),
        "tag": pa.array(tag, pa.string()),
        "pad": pa.array(pad, pa.string()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec, stripe_size=4096)
    return buf.getvalue()


NULL_REPLICAS = 32


def orc_time_file(ids, codec):
    # timestamp / date / decimal columns — the ORC temporal surface:
    # ts exercises the SECONDARY nanos trailing-zero packing (d % 7
    # varies the zero classes), dec the unbounded zigzag varints with
    # negatives, dt plain signed-RLEv2 days. All values are pure
    # functions of doc_id -> fully relational oracle. Pre-2015 rows
    # (negative seconds vs ORC's 2015 epoch) enter via small doc_ids.
    rows = sorted(ids * NULL_REPLICAS)
    D = decimal.Decimal
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "ts": pa.array(
            [1357000000000000 + d * 3600000003 + (d % 7) for d in rows],
            pa.timestamp("us")),
        "dt": pa.array([10000 + (d % 20000) for d in rows],
                       pa.date32()),
        "dec": pa.array(
            [(D((d * 31) % 1000000) - D(250000)) / D(10000)
             for d in rows], pa.decimal128(18, 4)),
        # pad forces multiple stripes (see orc_null_file)
        "pad": pa.array([f"doc-{d}-{i}" for i, d in enumerate(rows)],
                        pa.string()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec, stripe_size=4096)
    return buf.getvalue()


def orc_list_file(ids, codec):
    # LIST<long> column: the list column carries a LENGTH stream and
    # its child carries the concatenated elements (value count = sum
    # of lengths, NOT the stripe row count). d % 5 lengths (coprime
    # with the doc_id % 6 blob split, so EVERY blob sees empty lists
    # and all lengths 0..4); elements d*3+j are pure doc_id functions.
    rows = sorted(ids * NULL_REPLICAS)
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "vals": pa.array([[d * 3 + j for j in range(d % 5)]
                          for d in rows], pa.list_(pa.int64())),
        # pad forces multiple stripes (see orc_null_file)
        "pad": pa.array([f"doc-{d}-{i}" for i, d in enumerate(rows)],
                        pa.string()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec, stripe_size=4096)
    return buf.getvalue()


def orc_map_file(ids, codec):
    # MAP<string,long> column: LENGTH stream on the map column, KEY
    # and VALUE children hold the concatenated entries. d % 5 entry
    # counts (coprime with the blob split) include EMPTY maps in
    # every blob; keys k0..k4, values d*7+j — pure doc_id functions.
    rows = sorted(ids * NULL_REPLICAS)
    t = pa.table({
        "rec_id": pa.array(rows, pa.int64()),
        "m": pa.array([[(f"k{j}", d * 7 + j) for j in range(d % 5)]
                       for d in rows],
                      pa.map_(pa.string(), pa.int64())),
        # pad forces multiple stripes (see orc_null_file)
        "pad": pa.array([f"doc-{d}-{i}" for i, d in enumerate(rows)],
                        pa.string()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec, stripe_size=4096)
    return buf.getvalue()


def main():
    files = {}
    stripe_rows = {}
    str_files = {}
    null_files = {}
    time_files = {}
    list_files = {}
    map_files = {}
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
                ("orc:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            b = orc_file(ids, CODECS[table_id % 4])
            f = orc.ORCFile(io.BytesIO(b))
            assert f.nrows == len(ids) * REPLICAS
            files[key] = [("data-0.orc", "data", b, f.nstripes,
                           f.content_length)]
            # per-stripe aggregates through pyarrow's INDEPENDENT
            # stripe reads — the q267 pruning oracle (stripe row
            # boundaries are liborc buffering decisions, not
            # relationally derivable)
            srows = []
            for si in range(f.nstripes):
                st = f.read_stripe(si)
                rid = st.column("rec_id").to_pylist()
                sc = st.column("score").to_pylist()
                srows.append((si, len(rid), min(rid), max(rid),
                              sum(rid), sum(sc)))
            stripe_rows[key] = srows
            keys2 = hashlib.md5(
                ("orcstr:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keys2 not in str_files:
                str_files[keys2] = orc_str_file(ids,
                                                CODECS[table_id % 4])
            keys3 = hashlib.md5(
                ("orcnull:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keys3 not in null_files:
                null_files[keys3] = orc_null_file(ids,
                                                  CODECS[table_id % 4])
            keys4 = hashlib.md5(
                ("orctime:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keys4 not in time_files:
                time_files[keys4] = orc_time_file(ids,
                                                  CODECS[table_id % 4])
            keys5 = hashlib.md5(
                ("orclist:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keys5 not in list_files:
                list_files[keys5] = orc_list_file(ids,
                                                  CODECS[table_id % 4])
            keys6 = hashlib.md5(
                ("orcmap:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if keys6 not in map_files:
                map_files[keys6] = orc_map_file(ids,
                                                CODECS[table_id % 4])
    out = Path("fixtures")
    out.mkdir(exist_ok=True)
    keys, paths, kinds, blobs_col, nstripes, clens = [], [], [], [], [], []
    for k in sorted(files):
        for rel_path, kind, b, ns, cl in files[k]:
            keys.append(k)
            paths.append(rel_path)
            kinds.append(kind)
            blobs_col.append(b)
            nstripes.append(ns)
            clens.append(cl)
    pq.write_table(
        pa.table({
            "blob_key": keys,
            "rel_path": paths,
            "kind": kinds,
            "file_bytes": pa.array(blobs_col, pa.binary()),
            "n_stripes": pa.array(nstripes, pa.int64()),
            "content_length": pa.array(clens, pa.int64()),
        }),
        out / "orc_files.parquet",
    )
    print(f"orc_files.parquet: {len(keys)} rows, {len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")
    sk, sidx, srw, smn, smx, sis, sss = [], [], [], [], [], [], []
    for k in sorted(stripe_rows):
        for si, rw, mn, mx, isum, ssum in stripe_rows[k]:
            sk.append(k)
            sidx.append(si)
            srw.append(rw)
            smn.append(mn)
            smx.append(mx)
            sis.append(isum)
            sss.append(ssum)
    pq.write_table(
        pa.table({
            "blob_key": sk,
            "stripe_idx": pa.array(sidx, pa.int64()),
            "s_rows": pa.array(srw, pa.int64()),
            "s_min": pa.array(smn, pa.int64()),
            "s_max": pa.array(smx, pa.int64()),
            "s_id_sum": pa.array(sis, pa.int64()),
            "s_score_sum": pa.array(sss, pa.float64()),
        }),
        out / "orc_stripe_oracle.parquet",
    )
    print(f"orc_stripe_oracle.parquet: {len(sk)} stripe rows")
    k2 = sorted(str_files)
    pq.write_table(
        pa.table({
            "blob_key": k2,
            "rel_path": ["data-0.orc"] * len(k2),
            "kind": ["data"] * len(k2),
            "file_bytes": pa.array([str_files[k] for k in k2],
                                   pa.binary()),
        }),
        out / "orc_str_files.parquet",
    )
    print(f"orc_str_files.parquet: {len(k2)} tables, "
          f"{sum(len(v) for v in str_files.values())} bytes")
    k3 = sorted(null_files)
    pq.write_table(
        pa.table({
            "blob_key": k3,
            "rel_path": ["data-0.orc"] * len(k3),
            "kind": ["data"] * len(k3),
            "file_bytes": pa.array([null_files[k] for k in k3],
                                   pa.binary()),
        }),
        out / "orc_null_files.parquet",
    )
    print(f"orc_null_files.parquet: {len(k3)} tables, "
          f"{sum(len(v) for v in null_files.values())} bytes")
    k4 = sorted(time_files)
    pq.write_table(
        pa.table({
            "blob_key": k4,
            "rel_path": ["data-0.orc"] * len(k4),
            "kind": ["data"] * len(k4),
            "file_bytes": pa.array([time_files[k] for k in k4],
                                   pa.binary()),
        }),
        out / "orc_time_files.parquet",
    )
    print(f"orc_time_files.parquet: {len(k4)} tables, "
          f"{sum(len(v) for v in time_files.values())} bytes")
    k5 = sorted(list_files)
    pq.write_table(
        pa.table({
            "blob_key": k5,
            "rel_path": ["data-0.orc"] * len(k5),
            "kind": ["data"] * len(k5),
            "file_bytes": pa.array([list_files[k] for k in k5],
                                   pa.binary()),
        }),
        out / "orc_list_files.parquet",
    )
    print(f"orc_list_files.parquet: {len(k5)} tables, "
          f"{sum(len(v) for v in list_files.values())} bytes")
    k6 = sorted(map_files)
    pq.write_table(
        pa.table({
            "blob_key": k6,
            "rel_path": ["data-0.orc"] * len(k6),
            "kind": ["data"] * len(k6),
            "file_bytes": pa.array([map_files[k] for k in k6],
                                   pa.binary()),
        }),
        out / "orc_map_files.parquet",
    )
    print(f"orc_map_files.parquet: {len(k6)} tables, "
          f"{sum(len(v) for v in map_files.values())} bytes")


if __name__ == "__main__":
    main()
