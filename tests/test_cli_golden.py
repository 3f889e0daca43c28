"""End-to-end CLI golden tests: full pipeline vs reference clean-run outputs.

Runs the real ``sickle se|pe`` CLI (in-process, CPU backend) against the
bundled fixtures and checks byte-exact outputs (md5 from
golden_manifest.json) plus the summary counters.  Also covers the paths
the reference FAILS on (crash-regression suite, SURVEY.md §2.4): tiny
inputs, gzip output, -n on N-rich reads, pe -M.
"""

import gzip
import hashlib
import json
import pathlib
import re

import numpy as np
import pytest

from sickle_tpu import oracle
from sickle_tpu.cli import main
from sickle_tpu.constants import QualityType

HERE = pathlib.Path(__file__).parent
MANIFEST = json.loads((HERE / "golden_manifest.json").read_text())


def md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


def run_cli(args, capsys):
    rc = main(args)
    out = capsys.readouterr()
    return rc, out.out, out.err


# small record chunks exercise the multi-chunk path on the 2500-read fixtures
CHUNK_ARGS = ["-b", "1"]


@pytest.mark.parametrize(
    "name,extra",
    [
        ("se_q60_sanger", ["-t", "sanger", "-q", "60"]),
        ("se_q20_sanger", ["-t", "sanger", "-q", "20"]),
        ("se_q60_x", ["-t", "sanger", "-q", "60", "-x"]),
        ("se_q30_illumina", ["-t", "illumina", "-q", "30", "-l", "30"]),
        ("se_q20_solexa", ["-t", "solexa", "-q", "20"]),
        ("se_q60_l50", ["-t", "sanger", "-q", "60", "-l", "50"]),
    ],
)
def test_cli_se_golden(name, extra, tmp_path, reference_fixtures, capsys):
    out = tmp_path / "out.fastq"
    rc, stdout, _ = run_cli(
        ["se", "-f", str(reference_fixtures / "test.fastq"), "-o", str(out),
         "--compat", "fork"] + extra + CHUNK_ARGS,
        capsys,
    )
    assert rc == 0
    want = MANIFEST[name]["files"]["out.fastq"]
    data = out.read_bytes()
    assert len(data) == want["bytes"]
    assert md5(data) == want["md5"]
    m = re.search(
        r"Total FastQ records: (\d+)\nFastQ records kept: (\d+)\n"
        r"FastQ records discarded: (\d+)",
        MANIFEST[name]["stdout"],
    )
    assert (
        f"Total FastQ records: {m.group(1)}\n"
        f"FastQ records kept: {m.group(2)}\n"
        f"FastQ records discarded: {m.group(3)}" in stdout
    )


def test_cli_pe_two_file_golden(tmp_path, reference_fixtures, capsys):
    o1, o2, s = tmp_path / "o1.fastq", tmp_path / "o2.fastq", tmp_path / "s.fastq"
    rc, stdout, _ = run_cli(
        ["pe", "-f", str(reference_fixtures / "test.f.fastq"),
         "-r", str(reference_fixtures / "test.r.fastq"),
         "-t", "sanger", "-q", "60",
         "-o", str(o1), "-p", str(o2), "-s", str(s),
         "--compat", "fork"] + CHUNK_ARGS,
        capsys,
    )
    assert rc == 0
    files = MANIFEST["pe_q60"]["files"]
    assert md5(o1.read_bytes()) == files["out1.fastq"]["md5"]
    assert md5(o2.read_bytes()) == files["out2.fastq"]["md5"]
    assert md5(s.read_bytes()) == files["singles.fastq"]["md5"]
    assert "FastQ paired records kept: 2342 (1171 pairs)" in stdout
    assert "FastQ single records kept: 61 (from PE1: 43, from PE2: 18)" in stdout
    assert "FastQ paired records discarded: 36 (18 pairs)" in stdout
    # reference total is broken (SURVEY.md §2.4.7); ours is correct:
    assert "Total input FastQ records: 2500 (1250 pairs)" in stdout


def test_cli_pe_interleaved_golden(tmp_path, reference_fixtures, capsys):
    inter, s = tmp_path / "inter.fastq", tmp_path / "s.fastq"
    rc, stdout, _ = run_cli(
        ["pe", "-c", str(reference_fixtures / "test.fastq"),
         "-t", "sanger", "-q", "60",
         "-m", str(inter), "-s", str(s), "--compat", "fork"] + CHUNK_ARGS,
        capsys,
    )
    assert rc == 0
    files = MANIFEST["pei_q60"]["files"]
    assert md5(inter.read_bytes()) == files["inter.fastq"]["md5"]
    assert md5(s.read_bytes()) == files["singles.fastq"]["md5"]
    assert "FastQ single records kept: 61\n" in stdout


def test_cli_pe_M_mode(tmp_path, reference_fixtures, capsys):
    """-M: unimplemented in the reference fork; we implement upstream
    semantics and check against the oracle."""
    inter = tmp_path / "all.fastq"
    rc, stdout, _ = run_cli(
        ["pe", "-c", str(reference_fixtures / "test.fastq"),
         "-t", "sanger", "-q", "60", "-M", str(inter),
         "--compat", "fork"] + CHUNK_ARGS,
        capsys,
    )
    assert rc == 0
    data = (reference_fixtures / "test.fastq").read_bytes()
    want, _, _, c = oracle.trim_pe(
        data, interleaved=True, qualtype=QualityType.SANGER,
        qual_threshold=60, n_record_mode=True,
        compat=oracle.Compat.FORK,
    )
    assert inter.read_bytes() == want
    # every input record appears exactly once (pairing preserved)
    assert len(want.split(b"\n")) - 1 == 10000


def test_cli_se_gzip_in_and_out(tmp_path, reference_fixtures, capsys):
    """gzip output is BROKEN in the reference (gzprintf misuse); ours must
    produce a valid stream identical to the plain-output run."""
    data = (reference_fixtures / "test.fastq").read_bytes()
    gz_in = tmp_path / "in.fastq.gz"
    gz_in.write_bytes(gzip.compress(data))
    out_gz = tmp_path / "out.fastq.gz"
    rc, _, _ = run_cli(
        ["se", "-f", str(gz_in), "-o", str(out_gz), "-t", "sanger",
         "-q", "60", "-g", "--compat", "fork"],
        capsys,
    )
    assert rc == 0
    want = MANIFEST["se_q60_sanger"]["files"]["out.fastq"]
    assert md5(gzip.decompress(out_gz.read_bytes())) == want["md5"]


def test_cli_se_trunc_n_problem1(tmp_path, reference_fixtures, capsys):
    """-n on N-rich reads: 100% abort in the reference (npos bug).  We
    must produce the oracle's intended-upstream output."""
    out = tmp_path / "out.fastq"
    rc, stdout, _ = run_cli(
        ["se", "-f", str(reference_fixtures / "problem1.fastq"),
         "-o", str(out), "-t", "sanger", "-q", "20", "-n"],
        capsys,
    )
    assert rc == 0
    data = (reference_fixtures / "problem1.fastq").read_bytes()
    want, c = oracle.trim_se(
        data, qualtype=QualityType.SANGER, qual_threshold=20, trunc_n=True
    )
    assert out.read_bytes() == want
    assert f"FastQ records kept: {c.kept}" in stdout


def test_cli_tiny_input(tmp_path, capsys):
    """Small files crash the reference 100% (batch=file_size/8 races)."""
    src = tmp_path / "tiny.fastq"
    src.write_bytes(b"@r1 x\n" + b"A" * 40 + b"\n+\n" + b"I" * 40 + b"\n")
    out = tmp_path / "out.fastq"
    for _ in range(3):  # deterministic across runs
        rc, stdout, _ = run_cli(
            ["se", "-f", str(src), "-o", str(out), "-t", "sanger"], capsys
        )
        assert rc == 0
        assert out.read_bytes() == src.read_bytes().replace(b"+\n", b"+\n")
        assert "FastQ records kept: 1" in stdout


def test_cli_comment_rewrite_default_133(tmp_path, capsys):
    src = tmp_path / "in.fastq"
    src.write_bytes(b"@r1\n" + b"A" * 40 + b"\n+r1 a comment\n" + b"I" * 40 + b"\n")
    out = tmp_path / "out.fastq"
    rc, _, _ = run_cli(["se", "-f", str(src), "-o", str(out), "-t", "sanger"], capsys)
    assert rc == 0
    assert out.read_bytes() == b"@r1\n" + b"A" * 40 + b"\n+\n" + b"I" * 40 + b"\n"


def test_cli_quality_range_error(tmp_path, capsys):
    src = tmp_path / "in.fastq"
    qual = b"I" * 20 + b"\x1f" + b"I" * 19  # 0x1f < sanger min 33
    src.write_bytes(b"@r1\n" + b"A" * 40 + b"\n+\n" + qual + b"\n")
    out = tmp_path / "out.fastq"
    rc, _, err = run_cli(["se", "-f", str(src), "-o", str(out), "-t", "sanger"], capsys)
    assert rc == 1
    assert "does not fall within correct range for Sanger encoding" in err
    assert "Quality position: 21" in err


def test_cli_missing_args(capsys):
    rc, _, err = run_cli(["se", "-t", "sanger"], capsys)
    assert rc == 1
    assert "Must have quality type, input file, and output file" in err
    rc, _, err = run_cli(["pe", "-t", "sanger"], capsys)
    assert rc == 1
    assert "Must have either -f OR -c argument" in err


def test_cli_bad_qualtype(capsys):
    rc, _, err = run_cli(["se", "-t", "phred64", "-f", "x", "-o", "y"], capsys)
    assert rc == 1
    assert "Quality type 'phred64' is not a valid type" in err


def test_cli_version_and_help(capsys):
    rc, out, _ = run_cli(["--version"], capsys)
    assert rc == 0 and "sickle version 1.33" in out
    rc, out, _ = run_cli(["--help"], capsys)
    assert rc == 0 and "se\tsingle-end sequence trimming" in out


def test_cli_mismatched_pe_files(tmp_path, capsys):
    a, b = tmp_path / "a.fastq", tmp_path / "b.fastq"
    rec = b"@r\n" + b"A" * 40 + b"\n+\n" + b"I" * 40 + b"\n"
    a.write_bytes(rec * 3)
    b.write_bytes(rec * 2)
    rc, _, err = run_cli(
        ["pe", "-f", str(a), "-r", str(b), "-t", "sanger",
         "-o", str(tmp_path / "o1"), "-p", str(tmp_path / "o2"),
         "-s", str(tmp_path / "s")],
        capsys,
    )
    assert rc == 1
    assert "different lengths" in err


def test_fork_compat_building_reader_stdout(tmp_path, reference_fixtures, capsys):
    """--compat fork prints the fork's unconditional 'Building reader'
    stdout lines (GZReader.cpp:12 is a bare cout, present even in
    debug-disabled builds — they are in the recorded goldens' stdout);
    the 1.33 default stays quiet."""
    src = str(reference_fixtures / "test.fastq")
    out = str(tmp_path / "o.fastq")
    rc, stdout, _ = run_cli(["se", "-f", src, "-t", "sanger", "-q", "60",
                             "-o", out, "--compat", "fork"], capsys)
    assert rc == 0
    assert f"Building reader for {src}\n" in stdout
    rc, stdout, _ = run_cli(["se", "-f", src, "-t", "sanger", "-q", "60",
                             "-o", out], capsys)
    assert rc == 0
    assert "Building reader" not in stdout
    # pe two-file fork-compat: one line per reader, in open order
    rc, stdout, _ = run_cli([
        "pe", "-t", "sanger", "-q", "60", "--compat", "fork",
        "-f", str(reference_fixtures / "test.f.fastq"),
        "-r", str(reference_fixtures / "test.r.fastq"),
        "-o", str(tmp_path / "p1.fastq"), "-p", str(tmp_path / "p2.fastq"),
        "-s", str(tmp_path / "ps.fastq"),
    ], capsys)
    assert rc == 0
    i1 = stdout.find("Building reader for")
    i2 = stdout.find("Building reader for", i1 + 1)
    assert i1 >= 0 and i2 > i1
