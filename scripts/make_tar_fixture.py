#!/usr/bin/env python3
"""Build the golden tar fixture TarSpec pins the format against.

The sandbox JDK ships no tar implementation, so the independent-reader
proof comes from CPython's `tarfile` (the stdlib ustar writer): this
script writes an archive with the shapes that exercise the walker —
a directory entry, a zero-byte file, payloads needing 512-byte padding,
an exactly-one-block payload, and a long path that lands in the ustar
prefix field — and TarSpec asserts the walker recovers every name,
size, type, mtime, and data offset from the bytes.

Usage: python3 scripts/make_tar_fixture.py
Writes: fixtures/golden.tar
"""
import io
import tarfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "golden.tar"


def add_file(tf: tarfile.TarFile, name: str, data: bytes, mtime: int):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = mtime
    tf.addfile(info, io.BytesIO(data))


def main():
    OUT.parent.mkdir(exist_ok=True)
    with tarfile.open(OUT, "w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("corpus/")
        d.type = tarfile.DIRTYPE
        d.mtime = 1700000000
        tf.addfile(d)
        add_file(tf, "corpus/empty.txt", b"", 1700000001)
        add_file(tf, "corpus/doc.txt", b"hello tar world\n" * 3, 1700000002)
        add_file(tf, "corpus/block.bin", bytes(range(256)) * 2, 1700000003)
        # long path: 100+ chars forces the ustar prefix split
        long_name = "/".join(["deep"] * 22) + "/leaf.txt"
        add_file(tf, long_name, b"prefix-field exercised", 1700000004)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")

    # PAX (tarfile's default since 3.8, the format HF-style dataset
    # tarballs actually ship in): a >100-char BASENAME cannot use the
    # ustar prefix split, so tarfile writes an 'x' extended header with
    # a path= record; a non-ASCII name forces the same; short entries
    # interleave to prove overrides apply only to the entry they govern.
    pax = OUT.parent / "golden_pax.tar"
    with tarfile.open(pax, "w", format=tarfile.PAX_FORMAT) as tf:
        add_file(tf, "corpus/short.txt", b"plain entry\n", 1700000100)
        base = "shard-" + "x" * 120 + ".jsonl"  # 126-char basename
        add_file(tf, "corpus/" + base, b"long-basename payload\n" * 4,
                 1700000101)
        add_file(tf, "corpus/after.txt", b"override must not leak\n",
                 1700000102)
        add_file(tf, "corpus/naïve-ñame.txt", b"utf8 name\n",
                 1700000103)
    print(f"wrote {pax} ({pax.stat().st_size} bytes)")

    # GNU long names: the pre-POSIX 'L' mechanism
    gnu = OUT.parent / "golden_gnu.tar"
    with tarfile.open(gnu, "w", format=tarfile.GNU_FORMAT) as tf:
        add_file(tf, "a.txt", b"short\n", 1700000200)
        long_one = "g/" + "y" * 140 + "/tail.bin"
        add_file(tf, long_one, b"gnu long-link payload", 1700000201)
        add_file(tf, "z.txt", b"after\n", 1700000202)
    print(f"wrote {gnu} ({gnu.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
