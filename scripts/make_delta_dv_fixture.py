#!/usr/bin/env python3
"""Build the q270 Delta DELETION VECTOR fixture.

Delta's merge-on-read (PROTOCOL.md, "Deletion Vectors"): a row delete
re-ADDS the data file with a `deletionVector` descriptor naming dead
row POSITIONS as a 64-bit roaring bitmap — inline (Z85 text in the
log) or in a `deletion_vector_<uuid>.bin` file addressed by offset.
This script writes everything INDEPENDENTLY from the public specs:
Z85 per the ZeroMQ spec, RoaringBitmapArray portable serialization
(magic 1681511377 + per-bitmap RoaringFormatSpec with array
containers), and the DV file frame (1-byte version, BE32 size, data,
BE32 CRC-32).

Per table (documents bucketed doc_id % 6, parts (doc_id//6) % 3,
data files P0/P1/P2 sorted by doc_id):

  v0 json  protocol (readerVersion 3 / writerVersion 7, feature
           deletionVectors) + metaData + add P0/P1/P2 (no DVs)
  v1 json  the DV commit: remove+re-add each file with a vector —
    P0  INLINE  ("i"): positions of doc_id %  9 == 2
    P1  FILE    ("u", offset  1): positions of doc_id % 5 == 0
    P2  FILE    ("u", offset second slot, SAME file): doc_id % 7 == 3

Live rows = docs minus the three position sets; descriptors carry
exact cardinality/sizeInBytes so one mis-serialized byte anywhere —
alphabet, container, frame, CRC — breaks the engine's checks.

Usage: python3 scripts/make_delta_dv_fixture.py
Writes: fixtures/delta_dv_files.parquet
        (blob_key, rel_path, kind, file_bytes)
"""
import hashlib
import io
import json
import struct
import uuid as uuidlib
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
       "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")


def z85_encode(b: bytes) -> str:
    assert len(b) % 4 == 0
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def roaring_array(positions):
    """RoaringBitmapArray portable bytes: positions < 2^32, array
    containers only (the independent-writer role; the engine decodes
    array/bitmap/run alike)."""
    assert all(0 <= p < (1 << 32) for p in positions)
    by_key = {}
    for p in sorted(set(positions)):
        by_key.setdefault(p >> 16, []).append(p & 0xFFFF)
    out = bytearray()
    out += struct.pack("<i", 1681511377)  # portable magic
    out += struct.pack("<q", 1)           # one 32-bit bitmap
    n = len(by_key)
    out += struct.pack("<I", 12346)       # SERIAL_COOKIE_NO_RUNCONTAINER
    out += struct.pack("<i", n)
    for k in sorted(by_key):
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # offset table (always present with the no-run cookie)
    off = len(out) + 4 * n
    for k in sorted(by_key):
        out += struct.pack("<I", off)
        off += 2 * len(by_key[k])
    for k in sorted(by_key):
        for v in by_key[k]:
            out += struct.pack("<H", v)
    return bytes(out)


def dv_inline(positions):
    data = roaring_array(positions)
    padded = data + b"\x00" * (-len(data) % 4)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(data), "cardinality": len(positions)}


DATA_SCHEMA = pa.schema([
    pa.field("rec_id", pa.int64(), nullable=False),
    pa.field("score", pa.float64(), nullable=False),
])


def data_file(ids):
    t = pa.table(
        {"rec_id": ids, "score": [(d % 48) / 8.0 for d in ids]},
        schema=DATA_SCHEMA,
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy",
                   write_statistics=True, data_page_version="1.0")
    return buf.getvalue()


def add_action(path, size, dv=None):
    a = {"path": path, "partitionValues": {}, "size": size,
         "modificationTime": 1700000000000, "dataChange": dv is None}
    if dv is not None:
        a["deletionVector"] = dv
    return json.dumps({"add": a}, sort_keys=True)


def remove_action(path):
    return json.dumps({"remove": {
        "path": path, "deletionTimestamp": 1700000001000,
        "dataChange": False,
    }}, sort_keys=True)


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
                ("deltadv:" + ",".join(str(d) for d in ids)).encode()
            ).hexdigest()
            if key in files:
                continue
            parts = {x: [d for d in ids if (d // 6) % 3 == x]
                     for x in range(3)}
            names = {x: f"part-0000{x}-c000.snappy.parquet"
                     for x in range(3)}
            data = {x: data_file(parts[x]) for x in range(3)}
            # position sets (row index within the sorted file)
            pos0 = [i for i, d in enumerate(parts[0]) if d % 9 == 2]
            pos1 = [i for i, d in enumerate(parts[1]) if d % 5 == 0]
            pos2 = [i for i, d in enumerate(parts[2]) if d % 7 == 3]
            # DV file holding P1's and P2's vectors at two offsets
            dv_uuid = uuidlib.UUID(bytes=hashlib.md5(
                ("dvuuid:" + key).encode()).digest())
            dv_name = f"deletion_vector_{dv_uuid}.bin"
            body = bytearray(b"\x01")  # format version
            descs = {}
            for part, positions in ((1, pos1), (2, pos2)):
                d = roaring_array(positions)
                off = len(body)
                body += struct.pack(">i", len(d)) + d
                body += struct.pack(">I", zlib.crc32(d) & 0xFFFFFFFF)
                descs[part] = {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(dv_uuid.bytes),
                    "offset": off, "sizeInBytes": len(d),
                    "cardinality": len(positions)}
            meta = json.dumps({"metaData": {
                "id": key,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": [
                    {"name": "rec_id", "type": "long",
                     "nullable": False, "metadata": {}},
                    {"name": "score", "type": "double",
                     "nullable": False, "metadata": {}},
                ]}),
                "partitionColumns": [], "configuration": {},
                "createdTime": 1700000000000,
            }}, sort_keys=True)
            proto = json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}, sort_keys=True)
            commits = {
                0: "\n".join([proto, meta] +
                             [add_action(names[x], len(data[x]))
                              for x in range(3)]),
                1: "\n".join([
                    remove_action(names[0]),
                    add_action(names[0], len(data[0]), dv_inline(pos0)),
                    remove_action(names[1]),
                    add_action(names[1], len(data[1]), descs[1]),
                    remove_action(names[2]),
                    add_action(names[2], len(data[2]), descs[2])]),
            }
            rows = []
            for v, bodyc in sorted(commits.items()):
                rows.append((f"_delta_log/{v:020d}.json", "log",
                             (bodyc + "\n").encode("utf-8")))
            rows.append((dv_name, "dv", bytes(body)))
            for x in range(3):
                rows.append((names[x], "data", data[x]))
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
        out / "delta_dv_files.parquet",
    )
    print(f"delta_dv_files.parquet: {len(keys)} rows, "
          f"{len(files)} tables, "
          f"{sum(len(b) for b in blobs_col)} bytes")


if __name__ == "__main__":
    main()
