"""Pallas kernel (interpret mode) vs the jnp reference formulation.

On real TPU hardware the compiled kernel is additionally verified against
the jnp path at runtime (see bench.py and ops/trim_pallas.py docstring);
here we run the Mosaic-interpreted kernel on CPU over the fixture corpus
and adversarial property batches.
"""

import numpy as np
import pytest

from sickle_tpu.constants import Compat, QualityType
from sickle_tpu.io import pack_fastq
from sickle_tpu.ops import TrimParams, compute_cuts_jit
from sickle_tpu.ops.trim_pallas import compute_cuts_pallas

from test_trim_kernel import pack, random_reads


def assert_match(seq, qual, lens, params, tile_b=256):
    f1, t1, b1 = compute_cuts_jit(seq, qual, lens, params)
    f2, t2, b2 = compute_cuts_pallas(seq, qual, lens, params,
                                     tile_b=tile_b, interpret=True)
    for name, a, b in (("five", f1, f2), ("three", t1, t2), ("bad", b1, b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.mark.parametrize(
    "cfg",
    [
        (QualityType.SANGER, 60, 20, False, False, Compat.FORK),
        (QualityType.SANGER, 20, 20, False, True, Compat.V133),
        (QualityType.ILLUMINA, 30, 30, True, False, Compat.V133),
        (QualityType.SOLEXA, 20, 5, False, True, Compat.FORK),
        (QualityType.SANGER, 0, 0, False, False, Compat.V133),
    ],
)
def test_pallas_matches_jnp_fixture(cfg, reference_fixtures):
    qt, q, l, x, n, compat = cfg
    data = (reference_fixtures / "test.fastq").read_bytes()
    p = pack_fastq(data, batch_multiple=256)
    params = TrimParams(qualtype=qt, qual_threshold=q, length_threshold=l,
                        no_fiveprime=x, trunc_n=n, compat=compat)
    assert_match(p.seq, p.qual, p.lengths, params)


def test_pallas_matches_jnp_random():
    rng = np.random.default_rng(7)
    reads = random_reads(rng, 256, QualityType.SANGER)
    seq, qual, lens = pack(reads, B=256, L=256)
    for q in (20, 40):
        for n in (False, True):
            params = TrimParams(qual_threshold=q, trunc_n=n)
            assert_match(seq, qual, lens, params)


def test_pallas_small_batch_tile_clamp():
    # B < tile_b: tile clamps to B
    seq = np.zeros((8, 128), np.uint8)
    qual = np.full((8, 128), 70, np.uint8)
    lens = np.full(8, 100, np.int32)
    params = TrimParams()
    f, t, b = compute_cuts_pallas(seq, qual, lens, params, interpret=True)
    assert f.shape == (8,)


def test_pallas_long_reads():
    """Long reads (L >> 150) are viable now that the prefix sum is a
    log-shift scan (the round-2 O(L^2) MXU formulation needed an L x L
    VMEM matrix: 10 GB at 50 kbp).  Interpret-mode equivalence at
    L=4096 with mixed row lengths."""
    import numpy as np

    from sickle_tpu.ops import TrimParams, compute_cuts_jit
    from sickle_tpu.ops.trim_pallas import compute_cuts_pallas

    rng = np.random.default_rng(7)
    B, L = 16, 4096
    qual = (rng.integers(33, 74, (B, L))).astype(np.uint8)
    lens = rng.integers(100, L + 1, B).astype(np.int32)
    lens[0], lens[1] = L, 10  # boundary rows
    lane = np.arange(L)[None, :]
    qual = np.where(lane < lens[:, None], qual, 0).astype(np.uint8)
    seq = np.where(lane < lens[:, None], ord("A"), 0).astype(np.uint8)
    params = TrimParams(qual_threshold=30)
    fj, tj, bj = (np.asarray(x) for x in compute_cuts_jit(seq, qual, lens, params))
    fp, tp, bp = (np.asarray(x) for x in compute_cuts_pallas(
        seq, qual, lens, params, tile_b=8, interpret=True))
    np.testing.assert_array_equal(fp, fj)
    np.testing.assert_array_equal(tp, tj)
    np.testing.assert_array_equal(bp, bj)


@pytest.mark.parametrize(
    "cfg",
    [
        (QualityType.SANGER, 60, 20, False, False, Compat.FORK),
        (QualityType.SANGER, 20, 20, False, True, Compat.V133),
        (QualityType.ILLUMINA, 30, 30, True, False, Compat.V133),
        (QualityType.SOLEXA, 20, 5, False, True, Compat.FORK),
        (QualityType.SANGER, 0, 0, False, False, Compat.V133),
    ],
)
def test_pallas_uniform_kernel_matches(cfg, reference_fixtures):
    """The MXU-everything uniform-length kernel vs the jnp path on the
    fixture corpus (150 bp, the target case) with padding rows."""
    qt, q, l, x, n, compat = cfg
    data = (reference_fixtures / "test.fastq").read_bytes()
    p = pack_fastq(data, batch_multiple=256)
    params = TrimParams(qualtype=qt, qual_threshold=q, length_threshold=l,
                        no_fiveprime=x, trunc_n=n, compat=compat)
    # fixture reads are uniform 150 bp
    assert int(p.lengths.max()) == 150
    nz = p.lengths[p.lengths > 0]
    assert nz.min() == nz.max() == 150
    f1, t1, b1 = compute_cuts_jit(p.seq, p.qual, p.lengths, params)
    f2, t2, b2 = compute_cuts_pallas(p.seq, p.qual, p.lengths, params,
                                     tile_b=256, interpret=True,
                                     uniform_len=150)
    for name, a, b in (("five", f1, f2), ("three", t1, t2), ("bad", b1, b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_pallas_uniform_short_reads():
    # ul < 10: window = whole read (static)
    rng = np.random.default_rng(5)
    B, ul = 64, 8
    qual = np.zeros((B, 128), np.uint8)
    qual[:, :ul] = rng.integers(35, 75, (B, ul))
    qual[B // 2:] = 0  # padding rows
    seq = np.full((B, 128), ord("A"), np.uint8)
    lens = np.where(np.arange(B) < B // 2, ul, 0).astype(np.int32)
    params = TrimParams(qual_threshold=20, length_threshold=5)
    f1, t1, _ = compute_cuts_jit(seq, qual, lens, params)
    f2, t2, _ = compute_cuts_pallas(seq, qual, lens, params, tile_b=64,
                                    interpret=True, uniform_len=ul)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
