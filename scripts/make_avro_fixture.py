#!/usr/bin/env python3
"""Build the q230 Avro container-size oracle fixture.

q230's record-level coordinates are SQL-derivable, but the container's
BYTE SIZE is not: it depends on zigzag-varint widths, the metadata map,
and (for deflate blobs) CPython-zlib compressed block sizes. This
script reimplements the Avro object-container layout INDEPENDENTLY
from the public spec — magic, metadata map (avro.schema + avro.codec),
16-byte sync, per-block count/size varints, raw-deflate level 6 — and
records each blob's total size, keyed by
md5('<codec>:<doc_id=payload list>') so the same fixture serves every
sf dir (doc_id lists COLLIDE across sf dirs — the generator reuses
ids with different texts — so the key must capture the payloads too). A writer that mis-encoded one varint or
framed one block wrong changes the size and breaks the join.

Usage: python3 scripts/make_avro_fixture.py
Writes: fixtures/avro_size_oracle.parquet  (blob_key, container_bytes)
"""
import hashlib
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

SCHEMA_JSON = ('{"type":"record","name":"doc","fields":['
               '{"name":"rec_id","type":"long"},'
               '{"name":"payload","type":"string"}]}')


def varint(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while z & ~0x7f:
        out.append((z & 0x7f) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def string(s: str) -> bytes:
    b = s.encode("utf-8")
    return varint(len(b)) + b


def snappy_stored(raw: bytes) -> bytes:
    """A VALID snappy stream storing raw as one literal run — the
    deterministic layout the engine's Avro snappy writer emits
    (preamble uvarint + tag + bytes); byte-identical by construction.
    """
    out = bytearray()
    z = len(raw)
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    if raw:
        if len(raw) <= 60:
            out.append((len(raw) - 1) << 2)
        else:
            out.append(0xFC)
            n = len(raw) - 1
            out += bytes([n & 0xFF, (n >> 8) & 0xFF,
                          (n >> 16) & 0xFF, (n >> 24) & 0xFF])
        out += raw
    return bytes(out)


def zstd_stored(raw: bytes) -> bytes:
    """A VALID zstd frame of RAW blocks (RFC 8878) — the deterministic
    layout the engine's Avro zstandard writer emits: single-segment
    descriptor 0xA0, 4-byte LE content size, 128 KiB raw blocks.
    """
    out = bytearray(b"\x28\xb5\x2f\xfd\xa0")
    out += len(raw).to_bytes(4, "little")
    bmax = 128 * 1024
    p = 0
    while True:
        ln = min(bmax, len(raw) - p)
        last = 1 if p + ln >= len(raw) else 0
        hdr = (ln << 3) | last
        out += bytes([hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF])
        out += raw[p:p + ln]
        p += ln
        if p >= len(raw):
            break
    return bytes(out)


def container(records, sync: bytes, codec: str, block_records=5) -> bytes:
    out = bytearray(b"Obj\x01")
    out += varint(2) + string("avro.schema") + string(SCHEMA_JSON) \
        + string("avro.codec") + string(codec) + varint(0)
    out += sync
    for i in range(0, len(records), block_records):
        group = records[i:i + block_records]
        body = b"".join(varint(rid) + string(p) for rid, p in group)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = c.compress(body) + c.flush()
        elif codec == "snappy":
            # Avro spec: snappy payload + BE CRC32 of uncompressed
            body = snappy_stored(body) \
                + zlib.crc32(body).to_bytes(4, "big")
        elif codec == "zstandard":
            body = zstd_stored(body)
        out += varint(len(group)) + varint(len(body)) + body + sync
    return bytes(out)


def main():
    rows = {}
    for sf in SF_DIRS:
        p = Path("/root/testdata") / sf / "documents.parquet"
        if not p.exists():
            continue
        q = f"SELECT doc_id, text, n_chars FROM '{p}' ORDER BY doc_id"
        blobs = {}
        for doc_id, text, n_chars in duckdb.sql(q).fetchall():
            payload = hashlib.md5((text or "").encode("utf-8")).hexdigest() \
                * (1 + n_chars % 3)
            blobs.setdefault(doc_id % 8, []).append((doc_id, payload))
        for blob_id, recs in blobs.items():
            sync = bytes((blob_id * 31 + i * 7) % 256 for i in range(16))
            q230_codec = "deflate" if blob_id % 2 == 0 else "null"
            for codec in (q230_codec, "snappy",
                          "zstandard"):  # snappy q265, zstd q285
                key = hashlib.md5(
                    (codec + ":" + ",".join(f"{r[0]}={r[1]}"
                                            for r in recs))
                    .encode("ascii")).hexdigest()
                if key not in rows:
                    rows[key] = len(container(recs, sync, codec))
    out = Path(__file__).resolve().parent.parent / "fixtures"
    out.mkdir(exist_ok=True)
    keys = sorted(rows)
    table = pa.table({
        "blob_key": pa.array(keys, pa.string()),
        "container_bytes": pa.array([rows[k] for k in keys], pa.int64()),
    })
    pq.write_table(table, out / "avro_size_oracle.parquet")
    print(f"wrote {len(keys)} rows to {out / 'avro_size_oracle.parquet'}")


if __name__ == "__main__":
    main()
