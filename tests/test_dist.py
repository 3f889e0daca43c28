"""Multi-host distribution helpers + sharded step (virtual CPU mesh)."""

import io

import numpy as np
import pytest

from sickle_tpu.constants import Compat, QualityType
from sickle_tpu.ops import TrimParams
from sickle_tpu.parallel.dist import (
    host_file_shard,
    realign_to_record,
    sharded_trim_step,
    split_record_ranges,
)


def test_host_file_shard_round_robin():
    paths = [f"f{i}.fastq" for i in range(7)]
    s0 = host_file_shard(paths, process_id=0, num_processes=2)
    s1 = host_file_shard(paths, process_id=1, num_processes=2)
    assert s0 + s1 and set(s0) | set(s1) == set(paths)
    assert not set(s0) & set(s1)
    assert s0 == ["f0.fastq", "f2.fastq", "f4.fastq", "f6.fastq"]


def test_split_record_ranges(tmp_path, reference_fixtures):
    src = reference_fixtures / "test.fastq"
    data = src.read_bytes()
    for n in (2, 3, 8):
        ranges = split_record_ranges(src, n)
        assert sum(l for _, l in ranges) == len(data)
        # every shard starts at a record boundary and shards tile the file
        pos = 0
        rec_count = 0
        for off, length in ranges:
            assert off == pos
            shard = data[off : off + length]
            if shard:
                assert shard.startswith(b"@")
                lines = shard.split(b"\n")
                n_lines = len(lines) - (1 if lines[-1] == b"" else 0)
                assert n_lines % 4 == 0
                rec_count += n_lines // 4
            pos = off + length
        assert rec_count == 2500


def test_realign_quality_line_at_sign(tmp_path):
    # quality line starting with '@' must not be mistaken for a record start
    rec1 = b"@r1\nACGTACGT\n+\n@IIIIIII\n"  # qual starts with '@'
    rec2 = b"@r2\nACGTACGT\n+\nIIIIIIII\n"
    path = tmp_path / "x.fastq"
    path.write_bytes(rec1 + rec2)
    # offset inside rec1, just before the quality line
    off = realign_to_record(path, rec1.find(b"@I") - 0)
    assert off == len(rec1)  # lands on rec2, not the '@I...' quality line


def test_sharded_trim_step_counters(reference_fixtures):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sickle_tpu.io import pack_fastq
    from sickle_tpu.parallel import data_mesh

    data = (reference_fixtures / "test.fastq").read_bytes()
    p = pack_fastq(data, batch_multiple=8)
    B = p.batch_size - p.batch_size % 8
    params = TrimParams(qualtype=QualityType.SANGER, qual_threshold=60,
                        compat=Compat.FORK)
    mesh = data_mesh(8)
    step = sharded_trim_step(params, mesh)
    five, three, bad, total, kept = step(
        p.seq[:B], p.qual[:B], p.lengths[:B]
    )
    n_valid = int((p.lengths[:B] > 0).sum())
    assert int(total) == n_valid
    assert int(kept) == int((np.asarray(three)[:B] >= 0).sum())
