"""Single-pass Pallas TPU kernel for the sliding-window trim.

The jnp formulation (ops/trim.py) lowers to several fused-but-separate
XLA kernels, each re-reading the [B, L] arrays from HBM.  This kernel
loads each batch tile's seq/qual bytes into VMEM ONCE and computes the
cuts entirely on-chip, writing only three int32[B] vectors — HBM traffic
drops to the 2*B*L byte floor (plus outputs), which is the roofline for
this bandwidth-bound scan.

Math identical to ops/trim.py (and the scalar oracle); the rolling-window
comparison is done via the transform D[j] = C[j] - t*j so that
``W[i] >= t*w  <=>  D[i+w] >= D[i]`` — and the per-row dynamic shift ``w``
is resolved by a static loop over the possible window sizes (w in
[1, max(9, L//10)]), merged with selects.  All VMEM-resident, so the
extra passes cost VPU cycles, not HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import Compat, QUALITY_CONSTANTS
from .trim import BIG, TrimParams


def _first_index_lanes(mask, iota):
    """Smallest lane index where mask is true, else BIG; [TB] result."""
    return jnp.min(jnp.where(mask, iota, BIG), axis=1)


def _trim_kernel(seq_ref, qual_ref, len_ref, five_ref, three_ref, bad_ref,
                 *, params: TrimParams, L: int, wmax: int):
    offset, qmin, qmax = QUALITY_CONSTANTS[params.qualtype]
    t = jnp.int32(params.qual_threshold)
    lthr = jnp.int32(params.length_threshold)

    lens = len_ref[:].astype(jnp.int32)  # [TB]
    TB = lens.shape[0]
    raw = qual_ref[:].astype(jnp.int32)  # [TB, L]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    in_read = lane < lens[:, None]

    # quality range check (strict whole-read; see ops/trim.py docstring)
    badm = in_read & ((raw < qmin) | (raw > qmax))
    bad_ref[:] = _first_index_lanes(badm, lane)

    q = raw - offset
    qv = jnp.where(in_read, q, 0)

    w = lens // 10
    w = jnp.where(w == 0, lens, w)
    tw = t * w

    # D[j] = C[j] - t*j over j in [0, L); C = exclusive prefix sum.
    # (index L is never needed: i + w <= len <= L and when i + w == L the
    # slot is handled by the padded tail below.)
    csum = jnp.cumsum(qv, axis=1)
    c_excl = csum - qv  # exclusive prefix: C[j] = sum q[0..j-1]
    d = c_excl - t * lane  # D[j], j in [0, L)
    d_last = (csum[:, L - 1] - t * L)[:, None]  # D[L]

    # D[i + w] via static loop over window sizes, merged by select
    dw = jnp.zeros_like(d)
    for wv in range(1, wmax + 1):
        # shift left by wv: slots i in [0, L - wv) from d, tail from D[L]
        if wv < L:
            shifted = jnp.concatenate(
                [d[:, wv:], jnp.broadcast_to(d_last, (TB, wv))], axis=1
            )
        else:
            shifted = jnp.broadcast_to(d_last, (TB, L))
        dw = jnp.where((w == wv)[:, None], shifted, dw)

    ii = lane  # window start index i, valid for i <= len - w
    i_valid = ii <= (lens - w)[:, None]
    hi = i_valid & (dw >= d)
    lo = i_valid & (dw < d)

    i5 = _first_index_lanes(hi, ii)
    found_five = (i5 < BIG) & (lens > 0)

    start3 = jnp.zeros_like(i5) if params.no_fiveprime else i5
    i3 = _first_index_lanes(lo & (ii >= start3[:, None]), ii)
    three_trig = i3 < BIG

    if params.no_fiveprime:
        five = jnp.zeros_like(i5)
    else:
        five = _first_index_lanes(in_read & (q >= t) & (lane >= i5[:, None]), lane)
        five = jnp.where(found_five, jnp.minimum(five, lens), 0)

    three_hit = _first_index_lanes(in_read & (q < t) & (lane >= i3[:, None]), lane)
    three = jnp.where(three_trig, jnp.minimum(three_hit, lens), lens)

    if params.trunc_n:
        sq = seq_ref[:]
        up = _first_index_lanes(in_read & (sq == ord("N")), lane)
        low = _first_index_lanes(in_read & (sq == ord("n")), lane)
        if params.compat == Compat.V133:
            nidx = jnp.where(up < BIG, up, low)
        else:
            nidx = jnp.where(low < BIG, low, up)
        three = jnp.where(nidx < BIG, nidx - 1, three)

    keep = (lens >= lthr) & (three - five >= lthr) & (lens > 0)
    if not params.no_fiveprime:
        keep &= found_five

    five_ref[:] = jnp.where(keep, five, -1)
    three_ref[:] = jnp.where(keep, three, -1)


@functools.partial(jax.jit, static_argnames=("params", "tile_b", "interpret"))
def compute_cuts_pallas(seq, qual, lengths, params: TrimParams,
                        tile_b: int = 512, interpret: bool = False):
    """Drop-in replacement for ``compute_cuts_jit`` (same contract)."""
    B, L = qual.shape
    if B % tile_b:
        raise ValueError(f"batch {B} not divisible by tile_b {tile_b}")
    wmax = max(9, L // 10)
    grid = (B // tile_b,)
    kernel = functools.partial(_trim_kernel, params=params, L=L, wmax=wmax)
    row_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile_b,), lambda i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec],
        out_specs=(vec_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
    )(seq, qual, lengths.astype(jnp.int32))
    return out
