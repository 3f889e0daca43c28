"""Transparent plain/gzip stream handling.

The reference opens every input with zlib's gzopen, which transparently
reads both plain and gzipped files (/root/reference/src/GZReader.cpp:13).
We sniff the gzip magic bytes instead.  Output gzip uses streamed writes
(gzwrite semantics) — never the reference's broken
``gzprintf(file, payload)`` which treats quality bytes as a format string
and truncates (SURVEY.md §2.4.6).
"""

from __future__ import annotations

import gzip
import io
import os
import struct
import sys
import zlib
from typing import BinaryIO, Union

GZIP_MAGIC = b"\x1f\x8b"

PathLike = Union[str, os.PathLike]


def is_gzip(path: PathLike) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == GZIP_MAGIC


def open_input(path: PathLike) -> BinaryIO:
    """Open a FASTQ file for reading, decompressing gzip transparently."""
    if is_gzip(path):
        return gzip.open(path, "rb")
    return open(path, "rb", buffering=1 << 20)


class GzipChunkWriter(io.RawIOBase):
    """Streamed gzip writer using raw zlib for speed (level tuned for rate).

    Equivalent to gzwrite on a gzopen'd file; used for ``-g`` output.
    """

    def __init__(self, path: PathLike, level: int = 4):
        self._f = open(path, "wb", buffering=1 << 20)
        self._comp = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
        self._crc = 0
        self._size = 0
        # gzip header: magic, deflate, no flags, mtime 0, XFL 0, OS unknown
        self._f.write(b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff")

    def write(self, data) -> int:
        self._crc = zlib.crc32(data, self._crc)
        self._size += len(data)
        out = self._comp.compress(data)
        if out:
            self._f.write(out)
        return len(data)

    def writable(self) -> bool:
        return True

    def close(self) -> None:
        if self._f is None:
            return
        self._f.write(self._comp.flush())
        self._f.write(struct.pack("<II", self._crc & 0xFFFFFFFF, self._size & 0xFFFFFFFF))
        self._f.close()
        self._f = None
        super().close()


def open_output(path: PathLike, gzip_output: bool = False) -> BinaryIO:
    """Open an output stream; '-' or None means stdout (se ``-d`` teed copy
    is handled by the CLI layer)."""
    if path in (None, "-"):
        return sys.stdout.buffer
    if gzip_output:
        return GzipChunkWriter(path)
    return open(path, "wb", buffering=1 << 20)
