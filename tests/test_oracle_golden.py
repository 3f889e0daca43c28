"""Byte-exactness of the scalar oracle vs clean runs of the reference binary.

tests/golden_manifest.json was produced by building the reference
(pentalpha/sickle) and running each config repeatedly until 3 runs agreed
(the fork is race-prone; clean runs are deterministic — SURVEY.md §2.4/§6).
It records md5/size/line-count of every output file plus the summary stdout.

The oracle must reproduce every output file byte-for-byte (checked via md5)
and every reliable counter.  The reference pe 'Total input FastQ records'
counter is known-broken (SURVEY.md §2.4.7) and is not compared.
"""

import hashlib
import json
import pathlib
import re

import pytest

from sickle_tpu import oracle
from sickle_tpu.constants import Compat, QualityType

HERE = pathlib.Path(__file__).parent
MANIFEST = json.loads((HERE / "golden_manifest.json").read_text())

SE_CONFIGS = {
    # name -> (input, qualtype, q, l, no_fiveprime)
    "se_q20_sanger": ("test.fastq", QualityType.SANGER, 20, 20, False),
    "se_q60_sanger": ("test.fastq", QualityType.SANGER, 60, 20, False),
    "se_q60_x": ("test.fastq", QualityType.SANGER, 60, 20, True),
    "se_q20_illumina": ("test.fastq", QualityType.ILLUMINA, 20, 20, False),
    "se_q30_illumina": ("test.fastq", QualityType.ILLUMINA, 30, 30, False),
    "se_q20_solexa": ("test.fastq", QualityType.SOLEXA, 20, 20, False),
    "se_q60_l50": ("test.fastq", QualityType.SANGER, 60, 50, False),
    "se_q0": ("test.fastq", QualityType.SANGER, 0, 20, False),
}

PE_CONFIGS = {
    # name -> (interleaved, q, no_fiveprime)
    "pe_q60": (False, 60, False),
    "pe_q20": (False, 20, False),
    "pe_q60_x": (False, 60, True),
    "pei_q60": (True, 60, False),
    "pei_q20": (True, 20, False),
}


def md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


@pytest.mark.parametrize("name", sorted(SE_CONFIGS))
def test_se_golden(name, reference_fixtures):
    infile, qt, q, l, x = SE_CONFIGS[name]
    data = (reference_fixtures / infile).read_bytes()
    # the golden runs come from the fork binary: comment emitted verbatim.
    # (identical to 1.33 on these fixtures, whose comment lines are bare '+')
    out, c = oracle.trim_se(
        data,
        qualtype=qt,
        qual_threshold=q,
        length_threshold=l,
        no_fiveprime=x,
        compat=Compat.FORK,
    )
    want = MANIFEST[name]["files"]["out.fastq"]
    assert len(out) == want["bytes"]
    assert md5(out) == want["md5"]
    stdout = MANIFEST[name]["stdout"]
    m = re.search(
        r"Total FastQ records: (\d+)\nFastQ records kept: (\d+)\n"
        r"FastQ records discarded: (\d+)",
        stdout,
    )
    assert (c.total, c.kept, c.discarded) == tuple(int(g) for g in m.groups())


@pytest.mark.parametrize("name", sorted(PE_CONFIGS))
def test_pe_golden(name, reference_fixtures):
    interleaved, q, x = PE_CONFIGS[name]
    if interleaved:
        data1 = (reference_fixtures / "test.fastq").read_bytes()
        data2 = None
    else:
        data1 = (reference_fixtures / "test.f.fastq").read_bytes()
        data2 = (reference_fixtures / "test.r.fastq").read_bytes()
    out1, out2, singles, c = oracle.trim_pe(
        data1,
        data2,
        interleaved=interleaved,
        qualtype=QualityType.SANGER,
        qual_threshold=q,
        length_threshold=20,
        no_fiveprime=x,
        compat=Compat.FORK,
    )
    files = MANIFEST[name]["files"]
    if interleaved:
        got = {"inter.fastq": out1, "singles.fastq": singles}
    else:
        got = {"out1.fastq": out1, "out2.fastq": out2, "singles.fastq": singles}
    for fname, want in files.items():
        assert len(got[fname]) == want["bytes"], fname
        assert md5(got[fname]) == want["md5"], fname

    stdout = MANIFEST[name]["stdout"]
    kept_p = int(re.search(r"paired records kept: (\d+)", stdout).group(1))
    kept_s = int(re.search(r"single records kept: (\d+)", stdout).group(1))
    disc_p = int(re.search(r"paired records discarded: (\d+)", stdout).group(1))
    disc_s = int(re.search(r"single records discarded: (\d+)", stdout).group(1))
    assert c.kept_p == kept_p
    assert c.kept_s1 + c.kept_s2 == kept_s
    assert c.discard_p == disc_p
    assert c.discard_s1 + c.discard_s2 == disc_s
    if not interleaved:
        m = re.search(r"from PE1: (\d+), from PE2: (\d+)\)\nFastQ paired", stdout)
        assert (c.kept_s1, c.kept_s2) == (int(m.group(1)), int(m.group(2)))
    # reference pe 'total' is computed from the last batch only (§2.4.7);
    # ours is the correct sum:
    assert c.total == c.kept_p + c.kept_s1 + c.kept_s2 + c.discard_p + (
        c.discard_s1 + c.discard_s2
    )
