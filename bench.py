#!/usr/bin/env python
"""End-to-end benchmark: file -> trimmed file on the default JAX backend.

Prints ONE JSON line whose headline is single-end throughput:
  {"metric": "se_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N, "extra_metrics": {...}}

extra_metrics carries the BASELINE.md north-star rows measured in the
same process: pe pairs/s (two-file, 150 bp), BGZF-gzip-input reads/s,
and the device scan rate in GB/s vs the v5e HBM roofline (~819 GB/s).

Baselines (BASELINE.md, measured on the reference C++ pthreads build in
this container): se ~300k reads/s; gzip-in ~400k reads/s (100k reads in
~0.25 s); pe publishes no timing, so pairs/s uses the se equivalent rate
(150k pairs/s) as the documented proxy.

Methodology: tiny warmup (one slice -> one compiled executable), then ONE
measured pass per metric — the tunneled-TPU link rate-limits on
cumulative bytes (PERF_NOTES.md), so repeats would measure the throttle,
not the system.  All four metrics reuse the same [slice_rows, L]
executable; nothing recompiles between rows.
"""

import io
import json
import os
import sys
import tempfile
import time

BASELINE_SE_READS_PER_S = 300_000.0
BASELINE_PE_PAIRS_PER_S = 150_000.0  # proxy: se-equivalent rate (see above)
BASELINE_GZIP_READS_PER_S = 400_000.0
HBM_ROOFLINE_GB_S = 819.0  # TPU v5e HBM bandwidth
FIXTURE = "/root/reference/test/test.fastq"
FIXTURE_F = "/root/reference/test/test.f.fastq"
FIXTURE_R = "/root/reference/test/test.r.fastq"


def log(text):
    sys.stderr.write(f"[bench] {text}\n")
    sys.stderr.flush()


def main():
    copies = int(os.environ.get("SICKLE_BENCH_COPIES", "120"))
    # secondary rows ship fewer bytes: the tunneled link budgets
    # cumulative bytes, and the se headline (measured first, right after
    # warmup) gets the freshest window
    copies2 = int(os.environ.get("SICKLE_BENCH_COPIES2", str(max(copies // 3, 1))))
    rpc = int(os.environ.get("SICKLE_BENCH_RPC", str(1 << 16)))

    log("initializing jax backend...")
    import jax  # noqa: F401

    log(f"backend={_backend()}")

    from sickle_tpu.constants import Compat, QualityType
    from sickle_tpu.engine import EngineConfig, run_pe, run_se
    from sickle_tpu.engine.pipeline import default_cuts_fn
    from sickle_tpu.io.compression import BgzfWriter, open_input
    from sickle_tpu.ops import TrimParams

    params = TrimParams(
        qualtype=QualityType.SANGER, qual_threshold=60, length_threshold=20,
        compat=Compat.FORK,
    )
    cfg = EngineConfig(records_per_chunk=rpc)
    cuts_fn = default_cuts_fn(params, cfg)

    fixture = open(FIXTURE, "rb").read()
    n_reads = copies * 2500
    n_pairs = copies2 * 1250
    n_reads_gz = copies2 * 2500

    extra = {}
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "bench.fastq")
        with open(src, "wb") as f:
            for _ in range(copies):
                f.write(fixture)
        src_f = os.path.join(td, "bench_f.fastq")
        src_r = os.path.join(td, "bench_r.fastq")
        for path, name in ((src_f, FIXTURE_F), (src_r, FIXTURE_R)):
            part = open(name, "rb").read()
            with open(path, "wb") as f:
                for _ in range(copies2):
                    f.write(part)
        src_gz = os.path.join(td, "bench.fastq.gz")
        w = BgzfWriter(src_gz)
        w.write(fixture * copies2)
        w.close()
        out_path = os.path.join(td, "out.fastq")

        # warmup: compile the steady-state executable at the run's
        # [slice_rows, L] shape.  On TPU this is a zero-wire AOT compile
        # (lower().compile(), no device RPCs) so the measured pass gets
        # the link's whole cumulative-byte budget; other backends warm up
        # with a one-slice mini run.
        from sickle_tpu.engine.chunker import iter_record_chunks

        with open(src, "rb") as fin:
            warm_chunk = next(iter_record_chunks(fin, 1 << 14))
        t0 = time.perf_counter()
        aot_ok = False
        if hasattr(cuts_fn, "warmup_aot"):
            try:
                cuts_fn.warmup_aot(152)
                aot_ok = True
            except Exception as e:
                log(f"AOT warmup unavailable ({e}); falling back to mini run")
        if not aot_ok:
            with open(os.devnull, "wb") as devnull:
                run_se(io.BytesIO(warm_chunk), devnull, params, cfg=cfg,
                       cuts_fn=cuts_fn)
        warm_s = time.perf_counter() - t0
        log(f"warmup done in {warm_s:.1f}s (aot={aot_ok})")
        _settle_link()

        # --- headline: se plain-file -> plain-file ---
        with open(src, "rb") as fin, open(out_path, "wb") as fout:
            t0 = time.perf_counter()
            counters = run_se(fin, fout, params, cfg=cfg, cuts_fn=cuts_fn)
            se_s = time.perf_counter() - t0
        assert counters.total == n_reads, (counters.total, n_reads)
        se_rate = n_reads / se_s
        log(f"se: {n_reads} reads in {se_s:.3f}s -> {se_rate:,.0f} reads/s "
            f"(kept {counters.kept})")

        # --- pe two-file pairs/s ---
        o1 = os.path.join(td, "pe1.fastq")
        o2 = os.path.join(td, "pe2.fastq")
        so = os.path.join(td, "pes.fastq")
        with open(src_f, "rb") as f1, open(src_r, "rb") as f2, \
                open(o1, "wb") as w1, open(o2, "wb") as w2, \
                open(so, "wb") as ws:
            t0 = time.perf_counter()
            pc = run_pe(f1, f2, out1=w1, out2=w2, singles_out=ws,
                        params=params, cfg=cfg, cuts_fn=cuts_fn)
            pe_s = time.perf_counter() - t0
        assert pc.total == 2 * n_pairs, (pc.total, 2 * n_pairs)
        pe_rate = n_pairs / pe_s
        log(f"pe: {n_pairs} pairs in {pe_s:.3f}s -> {pe_rate:,.0f} pairs/s")
        extra["pe_pairs_per_s"] = {
            "value": round(pe_rate), "unit": "pairs/s",
            "vs_baseline": round(pe_rate / BASELINE_PE_PAIRS_PER_S, 2),
        }

        # --- gzip (BGZF) input reads/s ---
        with open_input(src_gz) as fin, open(out_path, "wb") as fout:
            t0 = time.perf_counter()
            gc = run_se(fin, fout, params, cfg=cfg, cuts_fn=cuts_fn)
            gz_s = time.perf_counter() - t0
        assert gc.total == n_reads_gz
        gz_rate = n_reads_gz / gz_s
        log(f"gzip-in: {n_reads_gz} reads in {gz_s:.3f}s -> "
            f"{gz_rate:,.0f} reads/s")
        extra["gzip_in_reads_per_s"] = {
            "value": round(gz_rate), "unit": "reads/s",
            "vs_baseline": round(gz_rate / BASELINE_GZIP_READS_PER_S, 2),
        }

        # --- device scan rate (GB/s vs HBM roofline) ---
        # device-resident batch, same compiled step; includes per-call
        # executor RPC latency, so this UNDERSTATES the kernel on the
        # tunneled link (PERF_NOTES.md: compute itself is ~0.08 ms/64k
        # reads ~ 120 GB/s measured device-side).
        try:
            gb_rate = _device_scan_rate(src, params, cfg, warm_chunk)
            extra["device_scan_gb_per_s"] = {
                "value": round(gb_rate, 1), "unit": "GB/s",
                "vs_baseline": round(gb_rate / HBM_ROOFLINE_GB_S, 3),
                "note": "vs v5e HBM roofline; includes per-call link RPC latency",
            }
            log(f"device scan: {gb_rate:.1f} GB/s "
                f"({gb_rate / HBM_ROOFLINE_GB_S:.1%} of v5e HBM roofline)")
        except Exception as e:  # never fail the bench on the aux metric
            log(f"device scan rate skipped: {e}")

    print(json.dumps({
        "metric": "se_reads_per_s",
        "value": round(se_rate),
        "unit": "reads/s",
        "vs_baseline": round(se_rate / BASELINE_SE_READS_PER_S, 2),
        "extra_metrics": extra,
    }))


def _settle_link():
    """Wait (bounded) for the shared tunneled-TPU link to drain before the
    one-pass measurement.

    The link charges a cumulative-byte budget shared across processes and
    recovers on idle (PERF_NOTES.md); a KB-scale probe reveals its state
    without refilling it.  Healthy round-trips are sub-ms; a throttled
    link shows 25 ms+ fines; a penalty box shows seconds.  Bounded by
    SICKLE_BENCH_SETTLE seconds (0 disables)."""
    import jax
    import jax.numpy as jnp

    max_wait = float(os.environ.get("SICKLE_BENCH_SETTLE", "900"))
    if max_wait <= 0 or jax.default_backend() != "tpu":
        return
    probe = jax.jit(lambda x: (x + 1).sum())
    x = jnp.zeros((128,), jnp.int32)
    start = time.time()
    while True:
        t0 = time.perf_counter()
        jax.block_until_ready(probe(x))
        dt = time.perf_counter() - t0
        waited = time.time() - start
        if dt < 0.005:  # fast window
            log(f"link probe {dt * 1e3:.1f} ms (fast window) — proceeding")
            return
        if dt < 0.05 and waited > max_wait / 2:
            log(f"link probe {dt * 1e3:.0f} ms (throttle regime) — "
                "half the settle budget spent, proceeding")
            return
        if waited > max_wait:
            log(f"link probe still {dt * 1e3:.0f} ms at settle deadline — "
                "proceeding anyway")
            return
        log(f"link probe {dt * 1e3:.0f} ms — letting the link drain...")
        time.sleep(20)


def _device_scan_rate(src, params, cfg, warm_chunk, iters=30):
    import jax

    from sickle_tpu.io.fastq import pack_fastq

    # small resident batch (2.5 MB): the measurement amortizes per-call
    # RPC latency over iters, not over batch bytes
    packed = pack_fastq(warm_chunk, batch_multiple=1 << 14, need_seq=False)
    qual = jax.device_put(packed.qual)
    from sickle_tpu.ops import compute_cuts_jit

    r = compute_cuts_jit(qual, qual, jax.device_put(packed.lengths), params)
    jax.block_until_ready(r)
    lengths = jax.device_put(packed.lengths)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compute_cuts_jit(qual, qual, lengths, params)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return packed.qual.size * iters / dt / 1e9


def _backend():
    import jax

    return f"{jax.default_backend()}:{len(jax.devices())}"


if __name__ == "__main__":
    main()
