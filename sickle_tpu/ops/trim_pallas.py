"""Single-pass Pallas TPU kernel for the sliding-window trim.

The jnp formulation (ops/trim.py) lowers to several fused-but-separate
XLA kernels — and its lane-axis ``take_along_axis`` gather is
catastrophically slow on TPU (~200ms per 64k-read batch measured on
v5e).  This kernel loads each batch tile's seq/qual bytes into VMEM ONCE
and computes the cuts entirely on-chip, writing only three int32[B]
vectors — HBM traffic drops to the 2*B*L byte floor, the roofline for
this bandwidth-bound scan.

Math identical to ops/trim.py (and the scalar oracle), restructured for
Mosaic:

* prefix sums on the MXU as one pair of exact bf16 nibble-split
  triangular matmuls (short reads, L <= 2048), falling back to a
  Hillis-Steele ``pltpu.roll`` log-shift scan on the VPU at long-read L
  where the L x L triangle no longer fits VMEM;
* the rolling-window comparison via the transform ``D[j] = C[j] - t*j``
  so ``W[i] >= t*w  <=>  D[i+w] >= D[i]``, with the per-row dynamic
  shift ``w`` resolved by a static select-merge loop over the possible
  window sizes (w in [1, max(9, L//10)]) — all VMEM-resident;
* every per-row value kept as a 2-D ``[TB, 1]`` column (1-D vectors hit
  XLA/Mosaic layout mismatches; reductions use ``keepdims=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import Compat, QUALITY_CONSTANTS
from .trim import BIG, TrimParams


def _first_col(mask, iota):
    """Smallest lane index where mask is true, else BIG; [TB, 1] column."""
    return jnp.min(jnp.where(mask, iota, BIG), axis=1, keepdims=True)


def _trim_kernel_noseq(qual_ref, len_ref, five_ref, three_ref, bad_ref,
                       *, params: TrimParams, L: int, wmax: int):
    # without -n the sequence bytes are never read; omitting the input
    # entirely halves the kernel's HBM traffic (a passed-but-unread
    # block is still DMA'd into VMEM every grid step)
    _trim_kernel(None, qual_ref, len_ref, five_ref, three_ref, bad_ref,
                 params=params, L=L, wmax=wmax)


def _trim_kernel(seq_ref, qual_ref, len_ref, five_ref, three_ref, bad_ref,
                 *, params: TrimParams, L: int, wmax: int):
    offset, qmin, qmax = QUALITY_CONSTANTS[params.qualtype]
    t = params.qual_threshold
    lthr = params.length_threshold

    lens = len_ref[:].astype(jnp.int32)  # [TB, 1]
    TB = lens.shape[0]
    raw = qual_ref[:].astype(jnp.int32)  # [TB, L]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    in_read = lane < lens

    # quality range check (strict whole-read; see ops/trim.py docstring)
    badm = in_read & ((raw < qmin) | (raw > qmax))
    bad_ref[:] = _first_col(badm, lane)

    q = raw - offset
    qv = jnp.where(in_read, q, 0)

    w = lens // 10
    w = jnp.where(w == 0, lens, w)

    # D[j] = C[j] - t*j; C = inclusive prefix sum.  The scan rides the
    # MXU as ONE pair of triangular matmuls instead of a log L VPU
    # shift chain (the round-2 O(L^2)-work objection applies to VPU
    # formulations; on the systolic array an L x L matmul per tile is
    # ~100x cheaper than log L full-tile roll+select passes).  Exactness:
    # q is split into nibbles (hi <= 5 for every encoding, lo <= 15), each
    # exact in bf16; per-matmul sums <= L*15 accumulate in f32 (exact to
    # 2^24); the recombined C <= L*93 < 2^24.  Negative decoded quals
    # (solexa min -5) are lifted by a static `base` and restored through
    # the prefix count min(j+1, len), so integer semantics are unchanged.
    # MXU path VMEM budget (round-3 ADVICE: L<=2048 near the cap could
    # exceed v5e VMEM): the L x L bf16 triangle plus its two i32 iota
    # intermediates (~10 L^2 bytes, assuming Mosaic materializes them) and
    # ~12 live [TB, L] i32 intermediates must fit well inside the ~16 MiB
    # core VMEM with headroom for double-buffered input DMA.  Larger L
    # takes the roll-scan fallback below (correct at every L; only the
    # scan's cost model changes).
    if 10 * L * L + 48 * TB * L <= (10 << 20):
        base = min(qmin - offset, 0)
        qnn = qv - jnp.where(in_read, base, 0) if base else qv
        tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
               ).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        ch = jax.lax.dot_general((qnn >> 4).astype(jnp.bfloat16), tri, dn,
                                 preferred_element_type=jnp.float32)
        cl = jax.lax.dot_general((qnn & 15).astype(jnp.bfloat16), tri, dn,
                                 preferred_element_type=jnp.float32)
        csum = (16.0 * ch + cl).astype(jnp.int32)
        if base:
            csum = csum + base * jnp.minimum(lane + 1, lens)
    else:
        # long reads: the L x L triangle no longer fits VMEM — fall back
        # to the Hillis-Steele log-shift scan (O(L log L) VPU work, no
        # L x L tensor).  pltpu.roll(x, s) rotates lanes so
        # rolled[i] = x[(i - s) % L]; wrapped lanes are masked to 0.
        csum = qv
        s = 1
        while s < L:
            rolled = pltpu.roll(csum, s, axis=1)
            csum = csum + jnp.where(lane >= s, rolled, 0)
            s <<= 1
    c_excl = csum - qv  # C[j] = sum q[0..j-1]
    total = csum[:, L - 1 : L]  # C[TB, 1]
    d = c_excl - t * lane  # D[j], j in [0, L)
    d_last = total - t * L  # D[L], [TB, 1]

    # D[i + w] by binary decomposition of the per-row shift: compose
    # conditional STATIC rotates by powers of two (hardware circular
    # rotate, pltpu.roll), overwriting wrapped lanes with D[L] so the
    # fill propagates — dw[i] = D[min(i+w, L)] in O(log wmax) passes.
    # Lane-dim alternatives fail: dynamic ref slices must be 128-aligned,
    # value-level dynamic_slice has no lowering, and unaligned
    # concatenates explode Mosaic compile time.  Lane i == L - s
    # legitimately needs D[L]; larger i are i_valid-masked.
    d_last_row = jnp.broadcast_to(d_last, (TB, L))
    dw = d
    for k in range(max(wmax, 1).bit_length()):
        s = 1 << k
        if s < L:
            rolled = pltpu.roll(dw, L - s, axis=1)  # rolled[i] = dw[(i+s) % L]
            cand = jnp.where(lane >= L - s, d_last_row, rolled)
        else:
            cand = d_last_row
        dw = jnp.where((w >> k) & 1 == 1, cand, dw)

    ii = lane  # window start index i, valid for i <= len - w
    i_valid = ii <= (lens - w)
    hi = i_valid & (dw >= d)
    lo = i_valid & (dw < d)

    i5 = _first_col(hi, ii)  # [TB, 1]
    found_five = (i5 < BIG) & (lens > 0)

    start3 = jnp.zeros_like(i5) if params.no_fiveprime else i5
    i3 = _first_col(lo & (ii >= start3), ii)
    three_trig = i3 < BIG

    if params.no_fiveprime:
        five = jnp.zeros_like(i5)
    else:
        five = _first_col(in_read & (q >= t) & (lane >= i5), lane)
        five = jnp.where(found_five, jnp.minimum(five, lens), 0)

    three_hit = _first_col(in_read & (q < t) & (lane >= i3), lane)
    three = jnp.where(three_trig, jnp.minimum(three_hit, lens), lens)

    if params.trunc_n:
        # widen before comparing: Mosaic has no u8 vector compare on v5e
        sq = seq_ref[:].astype(jnp.int32)
        up = _first_col(in_read & (sq == ord("N")), lane)
        low = _first_col(in_read & (sq == ord("n")), lane)
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


def _trim_kernel_uniform_noseq(qual_ref, len_ref, band_ref, tri_ref,
                               five_ref, three_ref, bad_ref, *, params, L,
                               ul):
    _trim_kernel_uniform(None, qual_ref, len_ref, band_ref, tri_ref,
                         five_ref, three_ref, bad_ref, params=params, L=L,
                         ul=ul)


def _trim_kernel_uniform(seq_ref, qual_ref, len_ref, band_ref, tri_ref,
                         five_ref, three_ref, bad_ref, *,
                         params: TrimParams, L: int, ul: int):
    """Uniform-read-length kernel (round-4): every non-padding row has
    length ``ul`` (the common Illumina case; padding rows are length 0),
    so the window size ``w`` is a COMPILE-TIME constant and the whole
    sequential trigger structure rides the MXU:

    * windowed sums  W[j] = sum q[j : j+w]  — one pair of exact bf16
      nibble matmuls against a static band matrix (no cumsum, no per-row
      shift chain);
    * the 5'/3' trigger ordering — PREFIX-OR masks via one triangular
      matmul each (``j >= i5  <=>  cumOR(hi)[j]``), replacing four
      first-index reductions and their cross-row broadcast dependency.

    Two lane reductions (five / three) remain on the VPU; everything
    else is a short fused elementwise chain plus four small matmuls.
    """
    offset, qmin, qmax = QUALITY_CONSTANTS[params.qualtype]
    t = params.qual_threshold
    lthr = params.length_threshold

    lens = len_ref[:].astype(jnp.int32)  # [TB, 1]; ul or 0
    TB = lens.shape[0]
    row_valid = lens > 0
    raw = qual_ref[:].astype(jnp.int32)  # [TB, L]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    in_read = row_valid & (lane < ul)

    badm = in_read & ((raw < qmin) | (raw > qmax))
    bad_ref[:] = _first_col(badm, lane)

    q = raw - offset
    qv = jnp.where(in_read, q, 0)

    w = ul // 10
    if w == 0:
        w = ul

    # W[j] = sum qnn[j : j+w) via band matmul; base-lift keeps operands
    # non-negative for the exact bf16 nibble split (solexa min -5).
    # band/tri are kernel OPERANDS (built once by XLA, resident for every
    # grid step) — constructing two L x L masks per tile cost more VPU
    # work than the rest of the kernel at small L.
    base = min(qmin - offset, 0)
    qnn = qv - jnp.where(in_read, base, 0) if base else qv
    band = band_ref[:]
    tri = tri_ref[:]
    dn = (((1,), (0,)), ((), ()))
    wh = jax.lax.dot_general((qnn >> 4).astype(jnp.bfloat16), band, dn,
                             preferred_element_type=jnp.float32)
    wl = jax.lax.dot_general((qnn & 15).astype(jnp.bfloat16), band, dn,
                             preferred_element_type=jnp.float32)
    W = (16.0 * wh + wl).astype(jnp.int32)  # lifted window sums

    i_valid = in_read & (lane <= ul - w)
    thresh = t * w - base * w  # W_true >= t*w  <=>  W_lifted >= thresh
    hi = i_valid & (W >= thresh)
    lo = i_valid & (W < thresh)

    # prefix-ORs on the MXU: count of set positions <= j, exact in f32
    ph = jax.lax.dot_general(hi.astype(jnp.bfloat16), tri, dn,
                             preferred_element_type=jnp.float32)
    prefix_hi = ph > 0.0
    found_five = row_valid & prefix_hi[:, L - 1 : L]

    lo3 = lo if params.no_fiveprime else (lo & prefix_hi)
    pl3 = jax.lax.dot_general(lo3.astype(jnp.bfloat16), tri, dn,
                              preferred_element_type=jnp.float32)
    prefix_lo3 = pl3 > 0.0
    three_trig = prefix_lo3[:, L - 1 : L]

    if params.no_fiveprime:
        five = jnp.zeros_like(lens)
    else:
        five = _first_col(in_read & (q >= t) & prefix_hi, lane)
        five = jnp.where(found_five, jnp.minimum(five, lens), 0)

    three_hit = _first_col(in_read & (q < t) & prefix_lo3, lane)
    three = jnp.where(three_trig, jnp.minimum(three_hit, lens), lens)

    if params.trunc_n:
        sq = seq_ref[:].astype(jnp.int32)
        up = _first_col(in_read & (sq == ord("N")), lane)
        low = _first_col(in_read & (sq == ord("n")), lane)
        if params.compat == Compat.V133:
            nidx = jnp.where(up < BIG, up, low)
        else:
            nidx = jnp.where(low < BIG, low, up)
        three = jnp.where(nidx < BIG, nidx - 1, three)

    keep = row_valid & (lens >= lthr) & (three - five >= lthr)
    if not params.no_fiveprime:
        keep &= found_five

    five_ref[:] = jnp.where(keep, five, -1)
    three_ref[:] = jnp.where(keep, three, -1)


@functools.partial(jax.jit, static_argnames=("params", "tile_b", "interpret",
                                             "uniform_len"))
def compute_cuts_pallas(seq, qual, lengths, params: TrimParams,
                        tile_b: int = 256, interpret: bool = False,
                        uniform_len=None):
    """Drop-in replacement for ``compute_cuts_jit`` (same contract).

    ``uniform_len``: static read length shared by every non-padding row —
    selects the MXU-everything kernel (see _trim_kernel_uniform)."""
    B, L = qual.shape
    tile_b = min(tile_b, B)
    if B % tile_b:
        raise ValueError(f"batch {B} not divisible by tile_b {tile_b}")
    wmax = max(9, L // 10)
    grid = (B // tile_b,)
    row_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # the uniform kernel holds two resident L x L bf16 matrices: only
    # take it when they fit the ~16 MiB VMEM comfortably
    uniform_ok = (uniform_len is not None
                  and 4 * L * L + 48 * tile_b * L <= (10 << 20))
    if uniform_ok:
        ul = uniform_len
        w = ul // 10
        if w == 0:
            w = ul
        src = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        dst = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        band = ((src >= dst) & (src < dst + w)).astype(jnp.bfloat16)
        tri = (src <= dst).astype(jnp.bfloat16)
        mat_spec = pl.BlockSpec((L, L), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    if params.trunc_n:
        if uniform_ok:
            kernel = functools.partial(_trim_kernel_uniform, params=params,
                                       L=L, ul=uniform_len)
            in_specs = [row_spec, row_spec, col_spec, mat_spec, mat_spec]
            args = (seq, qual, lengths.astype(jnp.int32).reshape(B, 1),
                    band, tri)
        else:
            kernel = functools.partial(_trim_kernel, params=params, L=L,
                                       wmax=wmax)
            in_specs = [row_spec, row_spec, col_spec]
            args = (seq, qual, lengths.astype(jnp.int32).reshape(B, 1))
    else:
        if uniform_ok:
            kernel = functools.partial(_trim_kernel_uniform_noseq,
                                       params=params, L=L, ul=uniform_len)
            in_specs = [row_spec, col_spec, mat_spec, mat_spec]
            args = (qual, lengths.astype(jnp.int32).reshape(B, 1), band, tri)
        else:
            kernel = functools.partial(_trim_kernel_noseq, params=params,
                                       L=L, wmax=wmax)
            in_specs = [row_spec, col_spec]
            args = (qual, lengths.astype(jnp.int32).reshape(B, 1))
    five, three, bad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(col_spec, col_spec, col_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        interpret=interpret,
    )(*args)
    return five[:, 0], three[:, 0], bad[:, 0]
