#!/usr/bin/env python3
"""Brotli fixtures for q354 + the RFC 7932 data tables for sources/Brotli.scala.

Two independent jobs:

1. Extract the RFC 7932 format tables (static dictionary Appendix A,
   context lookup table Appendix C, word transforms Appendix B) into
   src/main/resources/graft/*.bin. The bytes are spec-mandated public
   data; we pull them out of the system libbrotlicommon.a object files
   (Debian libbrotli-dev 1.0.9) rather than retyping 122 KB from the
   RFC text. Layouts verified here against the RFC's own examples
   (first length-4 words "time down life left...", transform 0 =
   ("", Identity, "")).

2. Generate fixtures/brotli_files.parquet — REAL brotli streams
   produced by libbrotlienc (ctypes) over per-blob document payloads
   at qualities 1 / 6 / 11 (q11 exercises static-dictionary words and
   transforms), plus a pyarrow-written parquet file with BROTLI
   (codec 4) compressed pages per blob. Keyed by md5 of the blob
   PAYLOAD (content, not ids: sf0.001 and sf0.01 share doc_ids but
   carry different texts).
"""
import ctypes
import hashlib
import io
import struct
import subprocess
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path("/root/repo")
RES = REPO / "src/main/resources/graft"
FIXT = REPO / "fixtures"
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

TRANSFORM_NAMES = {0: "Identity", 10: "FermentFirst", 11: "FermentAll"}


def extract_tables():
    RES.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        subprocess.run(["ar", "x",
                        "/usr/lib/x86_64-linux-gnu/libbrotlicommon.a"],
                       cwd=td, check=True)

        def rodata(obj):
            out = Path(td) / (obj + ".bin")
            subprocess.run(["objcopy", "-O", "binary",
                            "--only-section=.rodata", obj, str(out)],
                           cwd=td, check=True)
            return out.read_bytes()

        dict_data = rodata("dictionary.c.o")[:122784]
        assert dict_data[:4] == b"time" and dict_data[4:8] == b"down"
        (RES / "brotli-dictionary.bin").write_bytes(dict_data)

        ctx = rodata("context.c.o")[:2048]
        assert ctx[:4] == bytes([0, 1, 2, 3])  # LSB6 p1 table head
        (RES / "brotli-context.bin").write_bytes(ctx)

        tr = rodata("transform.c.o")
        td3 = tr[0:0x16B]
        pmap = struct.unpack("<50H", tr[0x180:0x180 + 0x64])
        pool = tr[0x200:0x200 + 0xD9]

        def pstr(i):
            off = pmap[i]
            return pool[off + 1:off + 1 + pool[off]]

        out = io.BytesIO()
        out.write(bytes([121]))
        for i in range(121):
            p, op, s = pstr(td3[i * 3]), td3[i * 3 + 1], pstr(td3[i * 3 + 2])
            out.write(bytes([len(p)]))
            out.write(p)
            out.write(bytes([op]))
            out.write(bytes([len(s)]))
            out.write(s)
        # RFC Appendix B pins: #0 ("", Identity, ""), #4 FermentFirst
        assert td3[0] == td3[2] and td3[1] == 0 and td3[13] == 10
        (RES / "brotli-transforms.bin").write_bytes(out.getvalue())
    print("tables:", [p.name for p in sorted(RES.glob("brotli-*.bin"))])


ENC = ctypes.CDLL("libbrotlienc.so.1")
ENC.BrotliEncoderCompress.restype = ctypes.c_int
ENC.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]


def brotli_compress(data: bytes, quality: int) -> bytes:
    cap = len(data) + 1024 + len(data) // 2
    out = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    ok = ENC.BrotliEncoderCompress(quality, 22, 0, len(data), data,
                                   ctypes.byref(n), out)
    assert ok == 1
    return out.raw[:n.value]


def payload(rows):
    return b"".join(b"D%d:" % d + t.encode("utf-8") + b"\n"
                    for d, t in rows)


def brotli_parquet(rows) -> bytes:
    tbl = pa.table({
        "rec_id": pa.array([d for d, _ in rows], pa.int64()),
        "val": pa.array([(d * 37) % 1031 for d, _ in rows], pa.int64()),
        "txt": pa.array([t for _, t in rows], pa.string())})
    buf = io.BytesIO()
    pq.write_table(tbl, buf, compression="BROTLI",
                   use_dictionary=False, write_statistics=False)
    return buf.getvalue()


def make_fixture():
    keys = {}
    for sf in SFS:
        docs = pq.read_table(Path(sf) / "documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        blobs = {}
        for r in docs:
            blobs.setdefault(r["doc_id"] % 6, []).append(
                (r["doc_id"], r["text"]))
        for _, rows in blobs.items():
            rows.sort()
            p = payload(rows)
            # keyed on CONTENT: sf0.001 and sf0.01 share doc_ids but
            # carry different texts — an id-only key collides
            key = hashlib.md5(b"brotli:" + p).hexdigest()
            if key in keys:
                continue
            entry = [("q1", brotli_compress(p, 1)),
                     ("q6", brotli_compress(p, 6)),
                     ("q11", brotli_compress(p, 11)),
                     ("parquet", brotli_parquet(rows))]
            keys[key] = entry
    rec = {"blob_key": [], "kind": [], "file_bytes": []}
    for key, entry in sorted(keys.items()):
        for kind, data in entry:
            rec["blob_key"].append(key)
            rec["kind"].append(kind)
            rec["file_bytes"].append(data)
    FIXT.mkdir(exist_ok=True)
    pq.write_table(
        pa.table({"blob_key": pa.array(rec["blob_key"], pa.string()),
                  "kind": pa.array(rec["kind"], pa.string()),
                  "file_bytes": pa.array(rec["file_bytes"], pa.binary())}),
        FIXT / "brotli_files.parquet")
    print("fixture rows:", len(rec["blob_key"]))


def make_spec_pairs():
    """Small (payload, stream) pairs for BrotliSpec — every payload
    class the decoder must survive: dictionary-heavy text, binary,
    empty, repetitive (long copies), multi-megabyte (several
    meta-blocks, block switches), UTF-8 (ferment transforms)."""
    out = REPO / "fixtures" / "brotli_spec"
    out.mkdir(parents=True, exist_ok=True)
    text = (b"The time of the life is down the back of the code. "
            b"Many people work with data and show the world the "
            b"right information about public services every day. "
            b"See the description of the development of the").ljust(
                2000, b" ") + b"government of the United States"
    rng = bytes((i * 197 + (i >> 3) * 13) & 0xFF for i in range(3000))
    rep = (b"abcdefgh" * 40 + b"0123456789") * 25
    utf8 = ("élève naïve Δελφο"
            " 日本語 test of the people ").encode() * 50
    big = b"".join(b"line %d: the quick brown fox %d jumps over %d\n"
                   % (i, i * i, i % 97) for i in range(30000))
    cases = {"text": text, "binary": rng, "empty": b"", "rep": rep,
             "utf8": utf8, "big": big}
    for name, payload in cases.items():
        (out / f"{name}.raw").write_bytes(payload)
        for q in (1, 6, 11):
            (out / f"{name}.q{q}.br").write_bytes(
                brotli_compress(payload, q))
    print("spec pairs:", sorted(p.name for p in out.glob("*.br"))[:6],
          "...")


if __name__ == "__main__":
    extract_tables()
    make_fixture()
    make_spec_pairs()
