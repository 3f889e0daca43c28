"""Property tests: the C++ host cuts kernel vs the scalar oracle.

Same matrix as test_trim_kernel.py, plus the LAZY quality-range
semantics the host kernel implements natively (a junk char errors only
if the reference's scan touches it — src/trim.cpp:66-73 breaks at the 3'
cut, so junk past the scan extent must NOT flag).
"""

import numpy as np
import pytest

from sickle_tpu import oracle
from sickle_tpu.constants import Compat, QUALITY_CONSTANTS, QualityType
from sickle_tpu.io import native
from sickle_tpu.ops import TrimParams
from sickle_tpu.ops.trim import BIG
from sickle_tpu.ops.trim_host import compute_cuts_host

from test_trim_kernel import CONFIGS, pack, random_reads


@pytest.mark.parametrize("qualtype", [QualityType.SANGER, QualityType.ILLUMINA,
                                      QualityType.SOLEXA])
@pytest.mark.parametrize("cfg", CONFIGS)
def test_host_kernel_matches_oracle(qualtype, cfg):
    q, l, x, n, compat = cfg
    rng = np.random.default_rng(hash(("host", qualtype, cfg)) % 2**32)
    reads = random_reads(rng, 256, qualtype)
    seq, qual, lens = pack(reads)
    params = TrimParams(
        qualtype=qualtype, qual_threshold=q, length_threshold=l,
        no_fiveprime=x, trunc_n=n, compat=compat,
    )
    five, three, bad = compute_cuts_host(seq, qual, lens, params)
    assert np.all(bad[: len(reads)] == BIG)  # all chars in range
    for i, (s, qq) in enumerate(reads):
        want = oracle.sliding_window_cuts(
            s, qq, qualtype=qualtype, qual_threshold=q, length_threshold=l,
            no_fiveprime=x, trunc_n=n, compat=compat,
        )
        got = (int(five[i]), int(three[i]))
        assert got == want, (
            f"read {i}: host kernel {got} != oracle {want}\n"
            f"len={len(s)} qual={qq!r} seq={s!r} cfg={cfg} {qualtype}"
        )
    # padding rows discarded
    assert np.all(five[len(reads):] == -1)


def test_host_kernel_long_reads():
    rng = np.random.default_rng(7)
    L = 50_000
    q = np.full(L, 70, np.uint8)
    q[: L // 5] = 33
    q[-L // 5:] = 33
    reads = [(rng.choice(list(b"ACGT"), L).astype(np.uint8).tobytes(),
              q.tobytes())]
    seq, qual, lens = pack(reads)
    params = TrimParams(qual_threshold=20, length_threshold=20)
    five, three, _ = compute_cuts_host(seq, qual, lens, params)
    want = oracle.sliding_window_cuts(
        reads[0][0], reads[0][1], qualtype=QualityType.SANGER,
        qual_threshold=20, length_threshold=20)
    assert (int(five[0]), int(three[0])) == want


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_host_kernel_lazy_quality_semantics():
    """Junk past the 3' break extent must not flag; touched junk must."""
    # high plateau then hard drop at 50: 3' scan breaks early; junk at the
    # very end is never touched by the reference's loop
    L = 100
    qual_ok_junk = np.full(L, 80, np.uint8)
    qual_ok_junk[50:] = 40  # below t=20+33 -> window drops, break near 50
    qual_ok_junk[L - 1] = 5  # junk, untouched (extent ~ 50 + w)
    # junk inside the initial window: always touched
    qual_bad = np.full(L, 80, np.uint8)
    qual_bad[3] = 5
    seq = np.full((2, 128), ord("A"), np.uint8)
    qual = np.zeros((2, 128), np.uint8)
    qual[0, :L] = qual_ok_junk
    qual[1, :L] = qual_bad
    lens = np.array([L, L], np.int32)
    params = TrimParams(qual_threshold=20, length_threshold=20)
    five, three, bad = compute_cuts_host(seq, qual, lens, params)
    assert bad[0] == BIG, "untouched junk past the break must not flag"
    assert bad[1] == 3, "touched junk must flag at its position"
    # oracle agrees: row 0 computes cleanly, row 1 raises
    f0 = oracle.sliding_window_cuts(
        b"A" * L, qual_ok_junk.tobytes(), qualtype=QualityType.SANGER,
        qual_threshold=20, length_threshold=20)
    assert (int(five[0]), int(three[0])) == f0
    with pytest.raises(oracle.QualityRangeError):
        oracle.sliding_window_cuts(
            b"A" * L, qual_bad.tobytes(), qualtype=QualityType.SANGER,
            qual_threshold=20, length_threshold=20)

    # strict mode flags the untouched junk too (whole-read check)
    _, _, bad_s = compute_cuts_host(
        seq, qual, lens, TrimParams(qual_threshold=20, length_threshold=20,
                                    strict=True))
    assert bad_s[0] == L - 1
    assert bad_s[1] == 3


def test_host_kernel_no_native_fallback(monkeypatch):
    """The lib-less scalar fallback returns the same contract."""
    monkeypatch.setattr(native, "get_lib", lambda: None)
    reads = [(b"ACGTACGTACGTACGTACGTACGT", bytes([70]) * 24),
             (b"ACGT", bytes([70]) * 4)]
    seq, qual, lens = pack(reads)
    params = TrimParams(qual_threshold=20, length_threshold=20)
    five, three, bad = compute_cuts_host(seq, qual, lens, params)
    want = oracle.sliding_window_cuts(
        reads[0][0], reads[0][1], qualtype=QualityType.SANGER,
        qual_threshold=20, length_threshold=20)
    assert (int(five[0]), int(three[0])) == want
    assert (int(five[1]), int(three[1])) == (-1, -1)  # below length threshold
    assert np.all(bad == BIG)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_host_kernel_strict_flags_short_reads():
    """--strict must flag out-of-range chars even in reads below the
    length threshold (the device path's whole-read check does; round-4
    review finding)."""
    L = 128
    qual = np.zeros((2, L), np.uint8)
    qual[0, :10] = 80
    qual[0, 5] = 5  # junk in a len-10 read, threshold 20 -> discarded early
    qual[1, :10] = 80
    lens = np.array([10, 10], np.int32)
    params_lazy = TrimParams(qual_threshold=20, length_threshold=20)
    params_strict = TrimParams(qual_threshold=20, length_threshold=20,
                               strict=True)
    _, _, bad_lazy = compute_cuts_host(None, qual, lens, params_lazy)
    _, _, bad_strict = compute_cuts_host(None, qual, lens, params_strict)
    assert bad_lazy[0] == BIG, "lazy semantics: never touched, no flag"
    assert bad_strict[0] == 5, "strict: whole-read check flags it"
    assert bad_strict[1] == BIG

    # indexed variant agrees
    from sickle_tpu.ops.trim_host import compute_cuts_indexed

    rec = b"@r\n" + b"A" * 10 + b"\n+\n" + bytes([80] * 5 + [5] + [80] * 4) + b"\n"
    data = np.frombuffer(rec * 2, np.uint8)
    from sickle_tpu.io.fastq import PackWorkspace, pack_fastq_stream

    ws = PackWorkspace(need_seq=False)
    packed, _ = pack_fastq_stream(data, 0, 4, workspace=ws, need_seq=False,
                                  need_rows=False)
    n = packed.n_records
    _, _, bad_i = compute_cuts_indexed(data, ws.starts4[:4 * n],
                                       ws.lens4[:4 * n], n, params_strict)
    assert bad_i[0] == 5
