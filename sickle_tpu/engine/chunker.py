"""Record-aligned chunking of FASTQ byte streams.

Equivalent of the reference's GZReader 4-line batch alignment and
remainder carry (src/GZReader.cpp:104-126), but chunks contain an exact
fixed number of RECORDS (not bytes) so every device batch has the same
shape — one XLA compilation serves the whole run.
"""

from __future__ import annotations

from typing import BinaryIO, Iterator

import numpy as np

NEWLINE = 0x0A
BLOCK_BYTES = 8 << 20


def iter_record_chunks(
    stream: BinaryIO,
    records_per_chunk: int,
    lines_per_record: int = 4,
    block_bytes: int = BLOCK_BYTES,
    skip_records: int = 0,
) -> Iterator[bytes]:
    """Yield byte buffers of exactly ``records_per_chunk`` records each.

    The final chunk may be short; a trailing unterminated line counts as a
    line (matching ``pack_fastq``).  Lines are only counted, never copied
    per-line — the scan is a vectorized newline search per input block.

    ``skip_records`` drops that many records from the stream's start
    before the first yield (checkpoint/resume fast-forward): the skipped
    bytes are scanned for record boundaries but never buffered or packed.
    """
    target = records_per_chunk * lines_per_record
    pending: list[bytes] = []
    nl_pending = 0
    carried: bytes = b""
    skip_lines = skip_records * lines_per_record
    while skip_lines > 0:
        block = stream.read(block_bytes)
        if not block:
            return
        arr = np.frombuffer(block, dtype=np.uint8)
        positions = np.flatnonzero(arr == NEWLINE)
        if positions.size < skip_lines:
            skip_lines -= positions.size
            continue
        cut = int(positions[skip_lines - 1]) + 1
        skip_lines = 0
        carried = block[cut:]  # remainder re-enters the normal chunk loop
    while True:
        if carried:
            block, carried = carried, b""
        else:
            block = stream.read(block_bytes)
        if not block:
            break
        arr = np.frombuffer(block, dtype=np.uint8)
        positions = np.flatnonzero(arr == NEWLINE)
        while nl_pending + positions.size >= target:
            need = target - nl_pending
            cut = int(positions[need - 1]) + 1
            pending.append(block[:cut])
            yield b"".join(pending)
            pending = []
            nl_pending = 0
            block = block[cut:]
            positions = positions[need:] - cut
        if block:
            pending.append(block)
            nl_pending += positions.size
    if pending:
        yield b"".join(pending)
