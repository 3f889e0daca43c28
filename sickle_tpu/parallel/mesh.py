"""Device mesh + sharded trimming step.

Single-host multi-chip: a 1-D ``data`` mesh; each chip computes cuts for
its row-shard of the packed batch.  The kernel is purely elementwise over
rows, so ``shard_map`` introduces zero collectives — XLA compiles one
per-shard program and the host assembles full outputs (tiny int32[B]
arrays) for the writer.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.trim import TrimParams, compute_cuts

DATA_AXIS = "data"


def data_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` LOCAL devices.

    Local, not global: in a multi-host run every host streams its own
    input shard and shards batches only over its own chips; the only
    cross-host communication is the end-of-run counter reduction
    (parallel.dist), never row data.
    """
    devs = list(devices if devices is not None else jax.local_devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def sharded_cuts_fn(params: TrimParams, mesh: Mesh, kernel=compute_cuts):
    """Build a jitted cuts function sharded row-wise over ``mesh``.

    The batch dimension must be divisible by the mesh size (the engine
    rounds chunk batches to a multiple of it).  ``kernel`` may be the jnp
    formulation or the Pallas kernel — both are row-local.
    """
    n = mesh.devices.size
    row = NamedSharding(mesh, P(DATA_AXIS))
    row2 = NamedSharding(mesh, P(DATA_AXIS, None))

    def step(seq, qual, lengths):
        return kernel(seq, qual, lengths, params)

    shard_mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
    )
    jitted = jax.jit(shard_mapped)

    def fn(seq, qual, lengths):
        B = seq.shape[0]
        if B % n:
            # pad rows up to a mesh multiple (padding rows have length 0
            # and are discarded by the kernel); callers slice results
            # back to their record count
            pad = n - B % n
            seq = np.pad(seq, ((0, pad), (0, 0)))
            qual = np.pad(qual, ((0, pad), (0, 0)))
            lengths = np.pad(lengths, (0, pad))
        seq = jax.device_put(seq, row2)
        qual = jax.device_put(qual, row2)
        lengths = jax.device_put(lengths, row)
        five, three, bad = jitted(seq, qual, lengths)
        if B % n:
            return five[:B], three[:B], bad[:B]
        return five, three, bad

    return fn
