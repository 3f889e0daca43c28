"""Multi-host distribution: runtime init, input sharding, counter merge.

The reference is strictly single-process (SURVEY.md §2.2/§5.8).  The
TPU-native scale-out story: every host streams its own shard of the input
(reads are embarrassingly parallel; no cross-chip traffic on the read
path), chips within a host shard each batch row-wise over ICI
(``mesh.sharded_cuts_fn``), and the ONLY global communication is the
end-of-run scalar counter reduction (psum over ICI/DCN).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.trim import TrimParams, compute_cuts
from .mesh import DATA_AXIS


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (multi-host).

    Equivalent role to an MPI/NCCL init in GPU-world frameworks; here it
    just wires the JAX coordination service so ``jax.devices()`` spans
    hosts and collectives ride ICI/DCN.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_file_shard(paths: Sequence, process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> List:
    """Round-robin assignment of input files to this host.

    gzip inputs are not byte-splittable, so multi-host sharding is by
    file (pre-shard datasets per host); plain files can additionally be
    byte-range split with :func:`split_record_ranges`.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [p for i, p in enumerate(paths) if i % n == pid]


def _looks_like_record_start(lines: List[bytes]) -> bool:
    """Phase detection for FASTQ byte-range splitting: a line is a record
    start if it begins with '@', the line 2 later begins with '+', and the
    seq/qual line lengths match.  ('@' can also start a quality line, so
    the single-char test alone is ambiguous.)"""
    if len(lines) < 4:
        return False
    return (
        lines[0][:1] == b"@"
        and lines[2][:1] == b"+"
        and len(lines[1]) == len(lines[3])
    )


def realign_to_record(path, offset: int, probe_bytes: int = 1 << 16) -> int:
    """Smallest byte offset >= ``offset`` that starts a FASTQ record."""
    if offset == 0:
        return 0
    with open(path, "rb") as f:
        f.seek(offset)
        probe = f.read(probe_bytes)
    # candidate line starts within the probe
    starts = [0] if offset == 0 else []
    pos = probe.find(b"\n")
    while pos >= 0 and pos + 1 < len(probe):
        starts.append(pos + 1)
        pos = probe.find(b"\n", pos + 1)
    for s in starts:
        lines = probe[s:].split(b"\n")
        if _looks_like_record_start(lines):
            return offset + s
    raise ValueError(f"no FASTQ record boundary within {probe_bytes} bytes of offset {offset}")


def split_record_ranges(path, n_shards: int) -> List[Tuple[int, int]]:
    """Split a PLAIN (uncompressed) FASTQ file into record-aligned
    (offset, length) byte ranges, one per shard."""
    import os

    size = os.path.getsize(path)
    bounds = [realign_to_record(path, size * i // n_shards) for i in range(n_shards)]
    bounds.append(size)
    return [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_shards)]


def _mapped(path) -> np.ndarray:
    return np.memmap(path, dtype=np.uint8, mode="r")


def _records_before(arr: np.ndarray, offset: int) -> int:
    """Record count in arr[:offset] (offset must be record-aligned)."""
    from ..io import native

    lib = native.get_lib()
    view = arr[:offset]
    if lib is not None:
        import ctypes

        nl = int(lib.sk_count_newlines(native.ptr(view, ctypes.c_uint8),
                                       view.size))
    else:
        nl = int(np.count_nonzero(view == 0x0A))
    return nl // 4


def _offset_of_record(arr: np.ndarray, k: int) -> int:
    """Byte offset where 0-based record ``k`` starts (arr.size if past EOF)."""
    if k == 0:
        return 0
    from ..io import native

    lib = native.get_lib()
    if lib is not None:
        import ctypes

        pos = int(lib.sk_kth_newline(native.ptr(arr, ctypes.c_uint8),
                                     arr.size, 4 * k))
    else:
        nl = np.flatnonzero(arr == 0x0A)
        pos = int(nl[4 * k - 1]) if nl.size >= 4 * k else -1
    return arr.size if pos < 0 else pos + 1


def shard_record_ranges(path, n_shards: int, align: int = 1) -> List[Tuple[int, int]]:
    """Record-aligned (offset, length) byte ranges, one per host, with
    every boundary additionally on an ``align``-record multiple
    (interleaved pe passes 2 so no host splits a pair).

    The per-host work is an independent stream over its range — no
    cross-host traffic on the read path (SURVEY.md §2.2); concatenating
    the shard outputs in shard order reproduces the single-host bytes.
    """
    ranges = split_record_ranges(path, n_shards)
    if align <= 1:
        return ranges
    arr = _mapped(path)
    bounds = []
    for off, _length in ranges:
        rec = _records_before(arr, off)
        if rec % align:
            off = _offset_of_record(arr, rec + (align - rec % align))
        bounds.append(off)
    bounds.append(arr.size)
    return [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_shards)]


def shard_paired_ranges(
    path1, path2, n_shards: int
) -> List[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Per-host byte ranges for a two-file pe run, split by PAIR index.

    File 1 is split byte-proportionally (record-aligned); file 2's
    boundaries are derived from file 1's record counts so both shards of a
    host hold exactly the same mates — pair decisions never cross hosts.
    """
    r1 = split_record_ranges(path1, n_shards)
    arr1 = _mapped(path1)
    arr2 = _mapped(path2)
    recs = [_records_before(arr1, off) for off, _ in r1]
    bounds2 = [_offset_of_record(arr2, k) for k in recs] + [arr2.size]
    out = []
    for i in range(n_shards):
        out.append(
            (r1[i], (bounds2[i], bounds2[i + 1] - bounds2[i]))
        )
    return out


@dataclasses.dataclass
class GlobalCounts:
    total: jnp.ndarray
    kept: jnp.ndarray


def sharded_trim_step(params: TrimParams, mesh: Mesh, kernel=compute_cuts):
    """The full sharded device step: per-row cuts + psum'd global counters.

    This is the complete multi-chip computation — the per-read work is
    row-local; the psum over the ``data`` axis is the only collective, and
    it reduces two scalars.  Returns a jitted fn
    ``(seq, qual, lengths) -> (five, three, first_bad, total, kept)``
    where the counters are replicated across the mesh.
    """

    def step(seq, qual, lengths):
        five, three, first_bad = kernel(seq, qual, lengths, params)
        valid = lengths > 0
        keep = three >= 0
        total = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), DATA_AXIS)
        kept = jax.lax.psum(jnp.sum(keep.astype(jnp.int32)), DATA_AXIS)
        return five, three, first_bad, total, kept

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        )
    )


def allreduce_host_counters(values: Sequence[int]) -> List[int]:
    """Sum per-host scalar counters across all hosts (no-op single-host).

    Used to merge the exact host-side SE/PE counters at end of run; rides
    the same coordination fabric as the device collectives.
    """
    if jax.process_count() == 1:
        return list(values)
    from jax.experimental import multihost_utils

    arr = np.asarray(values, dtype=np.int64)
    gathered = multihost_utils.process_allgather(arr)
    return list(np.sum(gathered, axis=0))
