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
