"""Property tests: the vectorized device kernel vs the scalar oracle.

Random reads are generated to hit every branch of the sliding-window spec
(SURVEY.md §2.3): len < threshold, len < 10 (window = whole read), all-high,
all-low, alternating, boundary quality chars at the encoding min/max, N/n
placement for -n, and the -x no-5' path.  The kernel must agree with the
oracle on every (five, three) pair.
"""

import numpy as np
import pytest

from sickle_tpu import oracle
from sickle_tpu.constants import Compat, QUALITY_CONSTANTS, QualityType
from sickle_tpu.ops import TrimParams, compute_cuts_jit


def random_reads(rng, n, qualtype, *, structured=True):
    """Generate (seq, qual) byte-string pairs with adversarial structure."""
    _, qmin, qmax = QUALITY_CONSTANTS[qualtype]
    reads = []
    for i in range(n):
        L = int(rng.choice([1, 2, 3, 5, 9, 10, 11, 19, 20, 21, 50, 100, 150, 199]))
        kind = i % 6 if structured else 5
        if kind == 0:  # all high
            q = np.full(L, qmax, np.uint8)
        elif kind == 1:  # all low
            q = np.full(L, qmin, np.uint8)
        elif kind == 2:  # rise then fall
            q = np.where(np.arange(L) < L // 2, qmax, qmin).astype(np.uint8)
        elif kind == 3:  # boundary values only
            q = rng.choice([qmin, qmax], L).astype(np.uint8)
        elif kind == 4:  # near-threshold plateau
            mid = (qmin + qmax) // 2
            q = rng.integers(mid - 2, mid + 3, L).astype(np.uint8)
        else:
            q = rng.integers(qmin, qmax + 1, L).astype(np.uint8)
        seq = rng.choice(list(b"ACGT"), L).astype(np.uint8)
        # sprinkle N/n for -n coverage
        if rng.random() < 0.5 and L > 0:
            for ch in (ord("N"), ord("n")):
                if rng.random() < 0.6:
                    seq[rng.integers(0, L)] = ch
        reads.append((seq.tobytes(), q.tobytes()))
    return reads


def pack(reads, B=None, L=None):
    n = len(reads)
    B = B or -(-n // 8) * 8
    maxlen = max(len(s) for s, _ in reads)
    L = L or -(-maxlen // 128) * 128
    seq = np.zeros((B, L), np.uint8)
    qual = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (s, q) in enumerate(reads):
        seq[i, : len(s)] = np.frombuffer(s, np.uint8)
        qual[i, : len(q)] = np.frombuffer(q, np.uint8)
        lens[i] = len(s)
    return seq, qual, lens


CONFIGS = [
    # (qual_threshold, length_threshold, no_fiveprime, trunc_n, compat)
    (20, 20, False, False, Compat.V133),
    (20, 20, False, True, Compat.V133),
    (20, 20, False, True, Compat.FORK),
    (20, 20, True, False, Compat.V133),
    (20, 20, True, True, Compat.V133),
    (40, 5, False, False, Compat.V133),
    (0, 0, False, False, Compat.V133),
    (60, 1, False, True, Compat.V133),
    (93, 20, False, False, Compat.V133),  # max sanger threshold
]


@pytest.mark.parametrize("formulation", ["gather", "shift"])
@pytest.mark.parametrize("qualtype", [QualityType.SANGER, QualityType.ILLUMINA, QualityType.SOLEXA])
@pytest.mark.parametrize("cfg", CONFIGS)
def test_kernel_matches_oracle(qualtype, cfg, formulation):
    q, l, x, n, compat = cfg
    rng = np.random.default_rng(hash((qualtype, cfg)) % 2**32)
    reads = random_reads(rng, 256, qualtype)
    seq, qual, lens = pack(reads)
    params = TrimParams(
        qualtype=qualtype,
        qual_threshold=q,
        length_threshold=l,
        no_fiveprime=x,
        trunc_n=n,
        compat=compat,
    )
    five, three, bad = compute_cuts_jit(seq, qual, lens, params,
                                        formulation=formulation)
    five, three = np.asarray(five), np.asarray(three)
    for i, (s, qq) in enumerate(reads):
        want = oracle.sliding_window_cuts(
            s, qq,
            qualtype=qualtype, qual_threshold=q, length_threshold=l,
            no_fiveprime=x, trunc_n=n, compat=compat,
        )
        got = (int(five[i]), int(three[i]))
        assert got == want, (
            f"read {i}: kernel {got} != oracle {want}\n"
            f"len={len(s)} qual={qq!r} seq={s!r} cfg={cfg} {qualtype}"
        )


def test_padding_rows_discarded():
    seq, qual, lens = pack([(b"ACGT" * 40, bytes([80]) * 160)], B=8)
    five, three, _ = compute_cuts_jit(seq, qual, lens, TrimParams())
    assert np.all(np.asarray(five)[1:] == -1)
    assert np.all(np.asarray(three)[1:] == -1)


def test_out_of_range_quality_located():
    good = bytes([80]) * 100
    bad = bytes([80]) * 50 + bytes([20]) + bytes([80]) * 49  # 20 < sanger min 33
    seq, qual, lens = pack([(b"A" * 100, good), (b"A" * 100, bad)])
    _, _, first_bad = compute_cuts_jit(seq, qual, lens, TrimParams())
    first_bad = np.asarray(first_bad)
    assert first_bad[0] >= lens[0]  # sentinel: no violation
    assert first_bad[1] == 50

    # the oracle raises with the reference's message for the same position
    with pytest.raises(oracle.QualityRangeError) as e:
        oracle.decode_qual(bad, QualityType.SANGER, b"@r1")
    assert "Quality position: 51" in e.value.message


@pytest.mark.parametrize("formulation", ["gather", "shift"])
@pytest.mark.parametrize("L_read", [1000, 10_000, 50_000])
def test_long_reads_match_oracle(L_read, formulation):
    """Long-read (ONT/PacBio-scale) parity: the reference handles arbitrary
    lengths (src/trim.cpp:8-34); the shift formulation must compile in
    O(log L) passes and agree with the oracle at L up to 50 kbp."""
    rng = np.random.default_rng(L_read)
    _, qmin, qmax = QUALITY_CONSTANTS[QualityType.SANGER]
    reads = []
    for kind in range(6):
        L = L_read - (kind * 7) % 10  # a few off-multiple lengths per batch
        if kind == 0:  # drops below threshold mid-read
            q = np.where(np.arange(L) < L // 2, 70, qmin).astype(np.uint8)
        elif kind == 1:  # all high: kept untrimmed at 3'
            q = np.full(L, qmax, np.uint8)
        elif kind == 2:  # all low: discarded (no 5')
            q = np.full(L, qmin, np.uint8)
        elif kind == 3:  # low head, high middle, low tail
            q = np.full(L, 70, np.uint8)
            q[: L // 5] = qmin
            q[-L // 5 :] = qmin
        else:  # noisy around threshold
            q = rng.integers(33 + 15, 33 + 25, L).astype(np.uint8)
        seq = rng.choice(list(b"ACGT"), L).astype(np.uint8)
        reads.append((seq.tobytes(), q.tobytes()))
    seq, qual, lens = pack(reads)
    params = TrimParams(qual_threshold=20, length_threshold=20)
    five, three, _ = compute_cuts_jit(seq, qual, lens, params,
                                      formulation=formulation)
    for i, (s, qq) in enumerate(reads):
        want = oracle.sliding_window_cuts(
            s, qq, qualtype=QualityType.SANGER, qual_threshold=20,
            length_threshold=20,
        )
        assert (int(five[i]), int(three[i])) == want, f"read {i} (L={len(s)})"


def test_window_guarantee_three_stays_len():
    # quality never drops below threshold -> three == len (kept untrimmed)
    L = 100
    seq, qual, lens = pack([(b"A" * L, bytes([126]) * L)])
    five, three, _ = compute_cuts_jit(seq, qual, lens, TrimParams(qual_threshold=20))
    assert (int(five[0]), int(three[0])) == (0, L)


@pytest.mark.parametrize("cfg", CONFIGS)
def test_uniform_len_variant_matches_oracle(cfg):
    """uniform_len (static window size, one static shift — the common
    Illumina case) must agree with the oracle and the generic kernel."""
    q, l, x, n, compat = cfg
    qualtype = QualityType.SANGER
    rng = np.random.default_rng(hash(("uni", cfg)) % 2**32)
    L_read = 150
    reads = []
    for i in range(128):
        base = random_reads(rng, 1, qualtype)[0]
        qq = (base[1] * (L_read // len(base[1]) + 1))[:L_read]
        ss = (base[0] * (L_read // len(base[0]) + 1))[:L_read]
        reads.append((ss, qq))
    seq, qual, lens = pack(reads)
    params = TrimParams(
        qualtype=qualtype, qual_threshold=q, length_threshold=l,
        no_fiveprime=x, trunc_n=n, compat=compat,
    )
    five, three, _ = compute_cuts_jit(seq, qual, lens, params,
                                      uniform_len=L_read)
    for i, (s, qq) in enumerate(reads):
        want = oracle.sliding_window_cuts(
            s, qq, qualtype=qualtype, qual_threshold=q, length_threshold=l,
            no_fiveprime=x, trunc_n=n, compat=compat,
        )
        assert (int(five[i]), int(three[i])) == want, f"read {i}"
    # padding rows discarded
    assert np.all(np.asarray(five)[len(reads):] == -1)
