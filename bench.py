#!/usr/bin/env python
"""End-to-end benchmark: se trimming throughput, file -> trimmed file.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ pthreads build measured in this container
(BASELINE.md): ~300k reads/s single-thread (150bp reads, se -q 60
sanger, clean runs).  vs_baseline is our reads/s over that number.

Input: the bundled 2500-read fixture concatenated SICKLE_BENCH_COPIES
times (default 120 -> 300k reads, ~99 MB), written to a temp file so the
measurement includes real file I/O, host pack/assemble, and device
compute — the same path a user runs.
"""

import io
import json
import os
import sys
import tempfile
import time

BASELINE_READS_PER_S = 300_000.0
FIXTURE = "/root/reference/test/test.fastq"


def main():
    copies = int(os.environ.get("SICKLE_BENCH_COPIES", "120"))
    repeats = int(os.environ.get("SICKLE_BENCH_REPEATS", "1"))
    rpc = int(os.environ.get("SICKLE_BENCH_RPC", str(1 << 16)))

    sys.stderr.write("[bench] initializing jax backend...\n")
    sys.stderr.flush()
    import jax

    sys.stderr.write(f"[bench] backend={_backend()}\n")
    sys.stderr.flush()

    from sickle_tpu.constants import Compat, QualityType
    from sickle_tpu.engine import EngineConfig, run_se
    from sickle_tpu.engine.pipeline import default_cuts_fn
    from sickle_tpu.ops import TrimParams

    params = TrimParams(
        qualtype=QualityType.SANGER, qual_threshold=60, length_threshold=20,
        compat=Compat.FORK,
    )
    cfg = EngineConfig(records_per_chunk=rpc)
    cuts_fn = default_cuts_fn(params)

    fixture = open(FIXTURE, "rb").read()
    n_reads = copies * 2500

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "bench.fastq")
        with open(src, "wb") as f:
            for _ in range(copies):
                f.write(fixture)
        out_path = os.path.join(td, "out.fastq")

        # warmup: compile the device step at the run's [slice_rows, L]
        # shape using only the first slice's worth of records — the
        # measured pass reuses the same executable for every slice.
        # (Deliberately tiny: the tunneled-TPU link rate-limits on
        # cumulative bytes, so a full-pass warmup would spend the fast
        # window the measurement needs.)
        from sickle_tpu.engine.chunker import iter_record_chunks

        with open(src, "rb") as fin:
            warm_chunk = next(iter_record_chunks(fin, cfg.slice_rows))
        with open(os.devnull, "wb") as devnull:
            t0 = time.perf_counter()
            run_se(io.BytesIO(warm_chunk), devnull, params, cfg=cfg, cuts_fn=cuts_fn)
            warm_s = time.perf_counter() - t0
        sys.stderr.write(f"[bench] warmup (1 slice) done in {warm_s:.1f}s\n")
        sys.stderr.flush()

        best = float("inf")
        for _ in range(repeats):
            with open(src, "rb") as fin, open(out_path, "wb") as fout:
                t0 = time.perf_counter()
                counters = run_se(fin, fout, params, cfg=cfg, cuts_fn=cuts_fn)
                best = min(best, time.perf_counter() - t0)
        assert counters.total == n_reads, (counters.total, n_reads)

        reads_per_s = n_reads / best
        sys.stderr.write(
            f"[bench] {n_reads} reads in {best:.3f}s (warmup {warm_s:.1f}s), "
            f"kept {counters.kept}; backend={_backend()}\n"
        )
        print(json.dumps({
            "metric": "se_reads_per_s",
            "value": round(reads_per_s),
            "unit": "reads/s",
            "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 2),
        }))


def _backend():
    import jax

    return f"{jax.default_backend()}:{len(jax.devices())}"


if __name__ == "__main__":
    main()
