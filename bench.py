#!/usr/bin/env python
"""End-to-end benchmark: file -> trimmed file on the default JAX backend.

Prints ONE JSON line whose headline is single-end throughput:
  {"metric": "se_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N, "extra_metrics": {...}}

extra_metrics carries the BASELINE.md north-star rows measured in the
same process: pe pairs/s (two-file, 150 bp), BGZF-gzip-input reads/s,
and the device scan rate in GB/s vs the v5e HBM roofline (~819 GB/s).

Baselines (BASELINE.md round-5 re-measurement of the reference C++
pthreads build in this container, strongest clean run per row): se
364,181 reads/s (2 threads), pe 262,203 pairs/s (1 thread — threads hurt
the fork's pe), gzip-in 400,000 reads/s.  Each row also reports
value_median / vs_baseline_median (the typical clean pass, not just the
best-of-3) and inline_compiles (must be 0: all rows reuse the warmed
executables).

Methodology (round 3, after the round-2 962 s stall, VERDICT.md item 1):
* zero-wire AOT warmup (lower().compile(), no device RPCs);
* KB-probe settle that proceeds in either STABLE regime — sub-5 ms
  (fast RPC) or 5-80 ms (throttle) — and only drains a deep penalty
  box; no byte canaries (see _settle_link: every canary design tried
  spent the burst budget the pass needed and still preceded a stall);
* every measured pass runs with per-chunk stage Metrics; a pass is
  CONTAMINATED if one chunk's device time is a >=20x outlier over the
  chunk median (utils.metrics.Metrics.stalled) or the whole-pass rate
  falls below SICKLE_BENCH_MIN_RATE (a deep-penalty-box link, where no
  outlier stands out because every chunk is slow);
* a contaminated pass gets up to two bounded settle-and-retries; the
  JSON reports the best pass plus honest flags: per-pass rates,
  stalled, retried, and the per-chunk median device rate;
* a global deadline (SICKLE_BENCH_DEADLINE) degrades gracefully:
  past it, no more retries — emit what was measured.

The tunneled-TPU link rate-limits on cumulative bytes (PERF_NOTES.md),
so repeats beyond the bounded retry would measure the throttle, not the
system.  All rows reuse one [slice_rows, L] executable; nothing
recompiles between rows.
"""

import io
import json
import os
import sys
import tempfile
import time

# Strongest measured reference numbers on this host (BASELINE.md round-5
# re-measurement: best clean run over 7, output-completeness-checked):
# se = 2-thread best, pe = 1-thread best (threads HURT the fork's pe),
# gzip-in keeps the survey session's stronger figure over today's 247k.
BASELINE_SE_READS_PER_S = 364_181.0
BASELINE_PE_PAIRS_PER_S = 262_203.0
BASELINE_GZIP_READS_PER_S = 400_000.0
HBM_ROOFLINE_GB_S = 819.0  # TPU v5e HBM bandwidth
FIXTURE = "/root/reference/test/test.fastq"
FIXTURE_F = "/root/reference/test/test.f.fastq"
FIXTURE_R = "/root/reference/test/test.r.fastq"

_DEADLINE = time.time() + float(os.environ.get("SICKLE_BENCH_DEADLINE", "2700"))

# XLA compile-event counter: every measured row must reuse the warmed
# executables — one stray inline compile silently invalidates a row
# (VERDICT r4 item 8).  measured_pass records the per-row delta.
_COMPILES = {"n": 0}


def _install_compile_counter():
    try:
        from jax._src import monitoring

        def _on_event(event, **kw):
            if "compile" in event:
                _COMPILES["n"] += 1

        monitoring.register_event_listener(_on_event)
    except Exception:
        pass


def log(text):
    sys.stderr.write(f"[bench] {text}\n")
    sys.stderr.flush()


def _time_left():
    return _DEADLINE - time.time()


def measured_pass(name, n_units, run, min_rate, make_cfg):
    """Run one metric's measured pass with stall detection + bounded retry.

    ``run(cfg)`` executes the pass (cfg carries a fresh Metrics) and
    returns the unit count processed.  Returns a dict: value (best
    units/s), seconds, stalled, retried, passes, chunk_median_ms.
    """
    from sickle_tpu.utils.metrics import Metrics

    attempts = []
    compiles0 = _COMPILES["n"]
    for attempt in range(3):
        cfg = make_cfg()
        cfg.metrics = m = Metrics()
        t0 = time.perf_counter()
        n = run(cfg)
        dt = time.perf_counter() - t0
        assert n == n_units, (name, n, n_units)
        rate = n_units / dt
        stalled = m.stalled()
        slow = rate < min_rate
        dev = m.chunk_device_ms()
        med = sorted(dev)[len(dev) // 2] if dev else 0.0
        attempts.append({"rate": rate, "s": dt, "stalled": stalled,
                         "slow": slow, "median_chunk_device_ms": med})
        log(f"{name} pass {attempt}: {n_units} in {dt:.3f}s -> "
            f"{rate:,.0f}/s (stalled={stalled} slow={slow} "
            f"chunk_med={med:.1f}ms)")
        if os.environ.get("SICKLE_BENCH_VERBOSE"):
            m.report()
        if not (stalled or slow):
            # confirmation passes (best-of-3): a clean pass still
            # carries first-touch page faults, writeback jitter, and
            # container CPU co-tenancy (±2x observed); the hybrid host
            # route costs no wire, so repeats are free of link budget
            if attempt <= 1 and _time_left() > 120:
                continue
            break
        if attempt < 2 and _time_left() > 180:
            log(f"{name}: pass contaminated — settling and retrying")
            _settle_link(max_wait=min(600.0, _time_left() - 60))
        else:
            break
    best = max(attempts, key=lambda a: a["rate"])
    clean = sorted(a["rate"] for a in attempts
                   if not (a["stalled"] or a["slow"])) or \
        sorted(a["rate"] for a in attempts)
    return {
        "value": best["rate"],
        # median CLEAN pass: the honest "typical" number next to the best
        # (container co-tenancy gives clean passes +-2x variance)
        "value_median": clean[len(clean) // 2],
        "seconds": best["s"],
        "stalled": bool(best["stalled"] or best["slow"]),
        # True only when a CONTAMINATED pass forced a settle-and-retry
        # (the routine best-of-2 confirmation pass is not a retry)
        "retried": any(a["stalled"] or a["slow"] for a in attempts),
        "passes": [round(a["rate"]) for a in attempts],
        "median_chunk_device_ms": round(best["median_chunk_device_ms"], 2),
        # >0: an executable compiled INSIDE a measured pass (warmup gap)
        "inline_compiles": _COMPILES["n"] - compiles0,
    }


def main():
    # 240 copies = 600k reads (198 MB input).  Round 4's hybrid
    # dispatcher changed the sizing calculus: the host kernel absorbs
    # whatever the link cannot carry (and rescues a stalled device chunk
    # after SICKLE_TPU_RESCUE_S), so the pass no longer needs to fit a
    # fast-window byte budget — it needs to be LONG enough to time a
    # ~1M+ reads/s hybrid pass honestly (~0.5 s)
    copies = int(os.environ.get("SICKLE_BENCH_COPIES", "240"))
    # secondary rows: half the headline's reads fill one 64k-row slice
    # almost exactly (pe pads both mates into one pow2 batch), so the
    # extra records ride padding that would ship anyway
    copies2 = int(os.environ.get("SICKLE_BENCH_COPIES2", str(max(copies // 2, 1))))
    # 64k-row slices: ~7.3 MB H2D each on the field wire — fewer
    # synchronizing RPCs to fine in the throttle regime, still well under
    # the fast window's 10MB-in-6ms envelope (PERF_NOTES.md)
    rpc = int(os.environ.get("SICKLE_BENCH_RPC", str(1 << 16)))
    min_rate = float(os.environ.get("SICKLE_BENCH_MIN_RATE", "150000"))

    log("initializing jax backend...")
    import jax  # noqa: F401

    _install_compile_counter()

    if os.environ.get("SICKLE_TPU_PLATFORM"):
        # env JAX_PLATFORMS alone does not stick in this container (the
        # sitecustomize force-registers the TPU plugin); post-import
        # config does — same contract as the CLI
        jax.config.update("jax_platforms", os.environ["SICKLE_TPU_PLATFORM"])
    log(f"backend={_backend()}")

    from sickle_tpu.constants import Compat, QualityType
    from sickle_tpu.engine import EngineConfig, run_pe, run_se
    from sickle_tpu.engine.pipeline import default_cuts_fn
    from sickle_tpu.io.compression import BgzfWriter, open_input, open_output
    from sickle_tpu.ops import TrimParams

    import dataclasses

    params = TrimParams(
        qualtype=QualityType.SANGER, qual_threshold=60, length_threshold=20,
        compat=Compat.FORK,
    )
    params_binned = dataclasses.replace(params, qual_threshold=20)

    def make_cfg():
        return EngineConfig(records_per_chunk=rpc, slice_rows=rpc)

    cfg0 = make_cfg()
    cuts_fn = default_cuts_fn(params, cfg0)
    cuts_fn_binned = default_cuts_fn(params_binned, cfg0)

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
                # band wire (6 planes: the fixture's 40-char band) at the
                # run's uniform 150 bp; the binned row's fn compiles its
                # rank-3 ladder separately (different TrimParams)
                # min_rows=32: the ragged-tail pow2 pieces go down to 32
                # rows — every piece must hit a precompiled executable or
                # a device-routed tail compiles inline mid-pass (the
                # inline_compiles counter enforces this stays 0)
                cuts_fn.warmup_aot(152, min_rows=32, read_len=150)
                if hasattr(cuts_fn_binned, "warmup_aot"):
                    cuts_fn_binned.warmup_aot(152, min_rows=32, planes=(),
                                              ranks=(3,), read_len=150)
                aot_ok = True
            except Exception as e:
                log(f"AOT warmup unavailable ({e}); falling back to mini run")
        if not aot_ok:
            with open(os.devnull, "wb") as devnull:
                run_se(io.BytesIO(warm_chunk), devnull, params, cfg=make_cfg(),
                       cuts_fn=cuts_fn)
        warm_s = time.perf_counter() - t0
        log(f"warmup done in {warm_s:.1f}s (aot={aot_ok})")

        # host warmup: one full host-only pass (trivial numpy cuts fn —
        # ZERO device traffic) warms the input page cache, the process
        # buffer pools, and the output file's pages, so the measured pass
        # measures the system rather than this container's ~400 us
        # first-touch page faults (PERF_NOTES.md round 3)
        import numpy as _np

        def _host_cuts(seq, qual, lengths):
            L = _np.asarray(lengths).astype(_np.int32)
            return (_np.zeros_like(L), _np.where(L > 0, L, -1),
                    _np.full_like(L, 0x3FFFFFFF))

        t0 = time.perf_counter()
        with open(src, "rb") as fin:
            fout = open_output(out_path)
            try:
                run_se(fin, fout, params, cfg=make_cfg(), cuts_fn=_host_cuts)
            finally:
                fout.close()
        log(f"host warmup pass done in {time.perf_counter() - t0:.1f}s")

        # warm every input's pages (the secondary rows' files would
        # otherwise pay their first disk read inside the measured pass)
        for pth in (src_f, src_r, src_gz):
            with open(pth, "rb") as f:
                while f.read(1 << 24):
                    pass

        # hybrid routing warmup: one SMALL unmeasured pass through EACH
        # real cuts fn so the dispatchers learn the link regime — a
        # fast-window-trap stall pays its one-time rescue tax here, not
        # inside a measured pass (the service-time EWMAs persist into
        # the measured passes, which then route accordingly)
        src_b = os.path.join(td, "bench_binned.fastq")
        _write_binned(src, src_b)
        t0 = time.perf_counter()
        with open(FIXTURE, "rb") as fin, open(os.devnull, "wb") as fout:
            run_se(fin, fout, params, cfg=make_cfg(), cuts_fn=cuts_fn)
        warm_b = os.path.join(td, "warm_binned.fastq")
        blob = open(src_b, "rb").read(1 << 20)
        nl = _np.flatnonzero(_np.frombuffer(blob, _np.uint8) == 0x0A)
        whole = nl[: (nl.size // 4) * 4]  # cut to whole 4-line records
        with open(warm_b, "wb") as f:
            f.write(blob[: int(whole[-1]) + 1] if whole.size else b"")
        with open(warm_b, "rb") as fin, open(os.devnull, "wb") as fout:
            run_se(fin, fout, params_binned, cfg=make_cfg(),
                   cuts_fn=cuts_fn_binned)
        log(f"routing warmup done in {time.perf_counter() - t0:.1f}s "
            f"(dev={getattr(cuts_fn, 'n_device', '?')} "
            f"rescued={getattr(cuts_fn, 'n_rescued', '?')})")
        _settle_link()

        # --- headline: se plain-file -> plain-file ---
        def run_headline(cfg):
            with open(src, "rb") as fin:
                fout = open_output(out_path)
                try:
                    return run_se(fin, fout, params, cfg=cfg,
                                  cuts_fn=cuts_fn).total
                finally:
                    fout.close()

        se = measured_pass("se", n_reads, run_headline, min_rate, make_cfg)
        se_rate = se["value"]
        # preliminary tail-line insurance: if a later row's link stall
        # outlives the harness timeout, the last stdout JSON line still
        # carries the measured headline (the final print supersedes it)
        print(json.dumps({
            "metric": "se_reads_per_s", "value": round(se_rate),
            "unit": "reads/s",
            "vs_baseline": round(se_rate / BASELINE_SE_READS_PER_S, 2),
            "extra_metrics": {"partial": True},
        }), flush=True)

        # --- pe two-file pairs/s ---
        o1 = os.path.join(td, "pe1.fastq")
        o2 = os.path.join(td, "pe2.fastq")
        so = os.path.join(td, "pes.fastq")

        def run_pe_row(cfg):
            with open(src_f, "rb") as f1, open(src_r, "rb") as f2:
                w1, w2, ws = (open_output(o1), open_output(o2),
                              open_output(so))
                try:
                    return run_pe(f1, f2, out1=w1, out2=w2, singles_out=ws,
                                  params=params, cfg=cfg,
                                  cuts_fn=cuts_fn).total // 2
                finally:
                    for w in (w1, w2, ws):
                        w.close()

        pe = measured_pass("pe", n_pairs, run_pe_row, min_rate / 2, make_cfg)
        extra["pe_pairs_per_s"] = {
            "value": round(pe["value"]), "unit": "pairs/s",
            "vs_baseline": round(pe["value"] / BASELINE_PE_PAIRS_PER_S, 2),
            "value_median": round(pe["value_median"]),
            "vs_baseline_median": round(
                pe["value_median"] / BASELINE_PE_PAIRS_PER_S, 2),
            "stalled": pe["stalled"],
            "inline_compiles": pe["inline_compiles"],
        }

        # --- gzip (BGZF) input reads/s ---
        def run_gz(cfg):
            with open_input(src_gz) as fin:
                fout = open_output(out_path)
                try:
                    return run_se(fin, fout, params, cfg=cfg,
                                  cuts_fn=cuts_fn).total
                finally:
                    fout.close()

        gz = measured_pass("gzip-in", n_reads_gz, run_gz, min_rate / 2,
                           make_cfg)
        extra["gzip_in_reads_per_s"] = {
            "value": round(gz["value"]), "unit": "reads/s",
            "vs_baseline": round(gz["value"] / BASELINE_GZIP_READS_PER_S, 2),
            "value_median": round(gz["value_median"]),
            "vs_baseline_median": round(
                gz["value_median"] / BASELINE_GZIP_READS_PER_S, 2),
            "stalled": gz["stalled"],
            "inline_compiles": gz["inline_compiles"],
        }

        # --- binned-qual se (rank wire: 4 levels -> 3 planes, 57 B/read)
        # modern Illumina (NovaSeq) emits 4 quality levels; the rank wire
        # ships dictionary ranks so the H2D cost halves vs the 6-plane
        # band wire.  Baseline: the same se reads/s target (the reference
        # is insensitive to the qual distribution).
        # q=20 (the tool default): with the 4 binned levels {2,12,23,37}
        # this trims real 5'/3' extents and writes real output (q=60
        # would discard every read — a dishonestly cheap pass)
        # re-warm the binned corpus' pages right before measuring: it is
        # written during routing warmup and the earlier rows' I/O can
        # evict it (two rehearsals each paid a deterministic ~11 s
        # disk-read pass 0 here)
        with open(src_b, "rb") as f:
            while f.read(1 << 24):
                pass

        def run_binned(cfg):
            with open(src_b, "rb") as fin, open(out_path, "wb") as fout:
                return run_se(fin, fout, params_binned, cfg=cfg,
                              cuts_fn=cuts_fn_binned).total

        bn = measured_pass("binned-se", n_reads, run_binned, min_rate,
                           make_cfg)
        extra["binned_se_reads_per_s"] = {
            "value": round(bn["value"]), "unit": "reads/s",
            "vs_baseline": round(bn["value"] / BASELINE_SE_READS_PER_S, 2),
            "value_median": round(bn["value_median"]),
            "vs_baseline_median": round(
                bn["value_median"] / BASELINE_SE_READS_PER_S, 2),
            "stalled": bn["stalled"],
            "inline_compiles": bn["inline_compiles"],
            "note": "NovaSeq-binned quals; rank wire ships 3-bit fields",
        }

        # --- device-only end-to-end (VERDICT r4 item 3): the TPU on the
        # critical path for EVERY chunk — no hybrid, no host fallback.
        # On the tunneled link this is wire-bound (PERF_NOTES rig-limit
        # table); the row records the observed rate + the saturation
        # cross-check (bytes/read x observed rate = implied wire MB/s)
        # and the sensed link regime, so "the device path is wire-bound,
        # not slow" is checkable instead of archaeological.
        dev_fn = getattr(cuts_fn, "device_fn", None)
        if dev_fn is None and not hasattr(cuts_fn, "call_packed"):
            dev_fn = cuts_fn  # non-hybrid backend: plain kernel fn
        if dev_fn is not None and os.environ.get(
                "SICKLE_BENCH_DEVICE_ROW", "1") != "0":
            copies3 = int(os.environ.get("SICKLE_BENCH_COPIES3",
                                         str(max(copies // 5, 1))))
            n_reads_dev = copies3 * 2500
            src_d = os.path.join(td, "bench_dev.fastq")
            with open(src_d, "wb") as f:
                for _ in range(copies3):
                    f.write(fixture)
            regime_ms = _probe_ms()
            if regime_ms > 80 or _time_left() < 240:
                # deep penalty box (or deadline pressure): a pure-device
                # pass has NO host rescue — a stalled RPC would block
                # minutes and eat the remaining rows' budget.  Record the
                # probe honestly instead of a doomed pass.
                extra["device_only_reads_per_s"] = {
                    "value": 0, "unit": "reads/s", "skipped": True,
                    "link_probe_ms_before": round(regime_ms, 1),
                    "link_regime": "penalty",
                    "note": "pass skipped: link in penalty box (KB probe "
                            f"{regime_ms:.0f} ms); see PERF_NOTES regimes",
                }
                log(f"device-only: skipped (probe {regime_ms:.0f} ms)")
            else:
                def run_dev(cfg):
                    with open(src_d, "rb") as fin:
                        fout = open_output(out_path)
                        try:
                            return run_se(fin, fout, params, cfg=cfg,
                                          cuts_fn=dev_fn).total
                        finally:
                            fout.close()

                dv = measured_pass("device-only", n_reads_dev, run_dev,
                                   10_000.0, make_cfg)
                # field wire: 6-bit band x 152-byte rows = 114 B/read H2D
                implied = dv["value"] * 114 / 1e6
                extra["device_only_reads_per_s"] = {
                    "value": round(dv["value"]), "unit": "reads/s",
                    "vs_baseline": round(
                        dv["value"] / BASELINE_SE_READS_PER_S, 2),
                    "value_median": round(dv["value_median"]),
                    "stalled": dv["stalled"],
                    "passes": dv["passes"],
                    "inline_compiles": dv["inline_compiles"],
                    "link_probe_ms_before": round(regime_ms, 1),
                    "link_regime": ("fast" if regime_ms < 5 else
                                    "throttle" if regime_ms < 80
                                    else "penalty"),
                    "wire_saturation_check":
                        f"{round(dv['value']):,} reads/s x 114 B/read = "
                        f"{implied:.1f} MB/s implied wire rate (throttle "
                        "regime sustains 33-57 MB/s; a match means the "
                        "pass ran at wire speed, not device speed)",
                }
                log(f"device-only: {dv['value']:,.0f} reads/s "
                    f"(implied wire {implied:.1f} MB/s, "
                    f"probe {regime_ms:.1f} ms)")

        # --- device scan rate (GB/s vs HBM roofline) ---
        # chained device-resident timing (see _device_scan_rate): the
        # honest kernel number, one RPC pair on the tunneled link.
        try:
            rates = _device_scan_rate(src, params, cfg0, warm_chunk)
            # headline = the engine's ACTUAL headline device program
            # (round-3 ADVICE): the planes step (decode + cuts) that the
            # se pass executes; falls back to the raw engine program when
            # that measurement was gated as unreliable
            reliable = {k: v for k, v in rates.items()
                        if not k.endswith("_unreliable")}
            default_kernel = ("engine_planes" if "engine_planes" in reliable
                              else "engine_raw")
            gb_rate = reliable.get(default_kernel,
                                   max(reliable.values(), default=0.0))
            extra["device_scan_gb_per_s"] = {
                "value": round(gb_rate, 1), "unit": "GB/s",
                "kernel": default_kernel,
                "all_kernels_gb_per_s": {k: round(v, 1) for k, v in rates.items()},
                "vs_baseline": round(gb_rate / HBM_ROOFLINE_GB_S, 3),
                "note": "vs v5e HBM roofline; salted marginal-cost chained timing (PALLAS_TPU_r05 methodology)",
            }
            log(f"device scan: {gb_rate:.1f} GB/s "
                f"({gb_rate / HBM_ROOFLINE_GB_S:.1%} of v5e HBM roofline)")
        except Exception as e:  # never fail the bench on the aux metric
            log(f"device scan rate skipped: {e}")

    print(json.dumps({
        "metric": "se_reads_per_s",
        "value": round(se_rate),
        "unit": "reads/s",
        "final": True,  # distinguishes from the preliminary tail line
        "vs_baseline": round(se_rate / BASELINE_SE_READS_PER_S, 2),
        "value_median": round(se["value_median"]),
        "vs_baseline_median": round(
            se["value_median"] / BASELINE_SE_READS_PER_S, 2),
        "extra_metrics": dict(extra, se_detail={
            "seconds": round(se["seconds"], 3),
            "stalled": se["stalled"],
            "retried": se["retried"],
            "passes_reads_per_s": se["passes"],
            "median_chunk_device_ms": se["median_chunk_device_ms"],
            "inline_compiles": se["inline_compiles"],
            "hybrid": {
                "chunks_device": getattr(cuts_fn, "n_device", None),
                "chunks_host": getattr(cuts_fn, "n_host", None),
                "chunks_rescued": getattr(cuts_fn, "n_rescued", None),
            },
        }),
    }))


def _write_binned(src, dst):
    """Rewrite ``src``'s quality chars onto 4 NovaSeq-style levels
    (q in {2,12,23,37} -> chars {35,45,56,70}): the binned-wire fixture."""
    import numpy as np

    data = np.fromfile(src, np.uint8)
    nl = np.flatnonzero(data == 0x0A)
    starts = np.concatenate([[0], nl[:-1] + 1])
    lut = np.arange(256, dtype=np.uint8)
    q = np.arange(256).astype(np.int32) - 33
    lut[:] = np.where(q < 7, 35, np.where(q < 18, 45,
                      np.where(q < 30, 56, 70))).astype(np.uint8)
    for i in range(3, starts.size, 4):  # quality lines
        lo, hi = starts[i], nl[i]
        data[lo:hi] = lut[data[lo:hi]]
    data.tofile(dst)


def _probe_ms() -> float:
    """One KB-scale jit round-trip, in ms — senses the link regime
    (<5 fast RPC, 5-80 stable throttle, above = penalty box)."""
    import jax
    import numpy as np

    if jax.default_backend() != "tpu":
        return 0.0
    probe = jax.jit(lambda x: (x + 1).sum())
    small = np.random.default_rng(1).integers(0, 1 << 20, (128,),
                                              dtype=np.int32)
    jax.block_until_ready(probe(small))  # compile outside the timing
    t0 = time.perf_counter()
    jax.block_until_ready(probe(small + 1))
    return (time.perf_counter() - t0) * 1e3


def _settle_link(max_wait=None):
    """Sense the shared tunneled-TPU link's regime before a one-pass
    measurement — and prefer the STABLE regime over the fast one.

    Empirical model, each rule from a recorded failure:
    * THROTTLE (KB probes 5-80 ms) is the stable regime: every measured
      pass taken there completed clean at the throttle byte rate
      (r3 logs: 226-257k reads/s).  Proceed IMMEDIATELY — draining
      toward "fast" spends wall clock and never upgraded the regime.
    * NO byte canaries: every canary strategy tried (1 MB zeros, one
      slice-size random canary, two 15 s-spaced canaries both clearing
      >=500 MB/s) was followed by a multi-minute mid-pass stall — the
      canary spends the very burst budget the pass needs.  On a fast
      KB probe the PASS ITSELF is the byte probe: if the window is
      real the pass rides it; if it is a mirage, pass 0 eats the stall
      and the bounded retry lands in post-stall throttle and completes
      clean (recorded: 323k reads/s retry after a 115 s pass-0 stall).
    Bounded by SICKLE_BENCH_SETTLE seconds (0 disables)."""
    import jax
    import numpy as np

    if max_wait is None:
        max_wait = float(os.environ.get("SICKLE_BENCH_SETTLE", "900"))
    max_wait = min(max_wait, max(_time_left() - 120, 0))
    if max_wait <= 0 or jax.default_backend() != "tpu":
        return
    probe = jax.jit(lambda x: (x + 1).sum())
    rng = np.random.default_rng(0)
    small = rng.integers(0, 1 << 20, (128,), dtype=np.int32)
    start = time.time()
    while True:
        t0 = time.perf_counter()
        jax.block_until_ready(probe(small))
        dt = time.perf_counter() - t0
        waited = time.time() - start
        if dt < 0.005:
            log(f"link probe {dt * 1e3:.1f} ms — fast RPCs, proceeding "
                "(the pass itself probes the byte budget)")
            return
        if dt < 0.08:
            log(f"link probe {dt * 1e3:.0f} ms — stable throttle regime, "
                "proceeding")
            return
        if waited > max_wait:
            log("settle deadline — proceeding in current state")
            return
        log(f"link probe {dt * 1e3:.0f} ms — deep penalty, draining...")
        time.sleep(20)


def _device_scan_rate(src, params, cfg, warm_chunk):
    """Device-resident kernel rate via chained iteration: K kernel
    calls inside ONE jit, each iteration's input data-dependent on the
    previous output, so XLA can neither hoist nor elide the kernel and
    the tunneled link contributes exactly one RPC round-trip (the
    round-2 per-call version measured RPC latency, not the kernel).

    The resident batch is tiled to 64k rows ON DEVICE (one 2.5 MB wire
    transfer regardless).  Returns {kernel_name: GB/s} for every kernel
    that runs; the caller headlines the engine-default kernel's rate
    (round-3 ADVICE: the artifact must reflect what the engine runs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from sickle_tpu.io.fastq import pack_fastq, qual_fields
    from sickle_tpu.ops.trim import (compute_cuts, compute_cuts_from_q,
                                     decode_fields)
    from sickle_tpu.ops.trim_pallas import compute_cuts_pallas

    packed = pack_fastq(warm_chunk, batch_multiple=1 << 14, need_seq=False)
    reps = max(1, (1 << 16) // packed.qual.shape[0])
    L = packed.qual.shape[1]
    q0 = jax.device_put(packed.qual)  # 2.5 MB wire; tiled on device below
    lens_small = jax.device_put(packed.lengths.astype(np.int32))
    # the engine's ACTUAL headline device program is the field-wire step:
    # subfield decode + derive-lengths + cuts (uniform window)
    from sickle_tpu.io.fastq import QUAL_PLANES, qual_minmax

    mn, _ = qual_minmax(packed.qual)
    bias = mn - 1
    fields0 = jax.device_put(qual_fields(packed.qual, bias))
    offset = 33  # sanger fixture

    def make_run(kernel, K):
        @jax.jit
        def run(x_small, salt):
            x = jnp.tile(x_small, (reps, 1))
            x = x.at[0, 1].set((salt & 0x1f).astype(jnp.uint8) + 66)
            lens = jnp.tile(lens_small, reps)
            def body(i, carry):
                x, acc = carry
                three = kernel(x, lens)
                x = x.at[0, 0].set((three[0] % 60 + 33).astype(jnp.uint8))
                return x, acc + three.sum()
            return lax.fori_loop(0, K, body, (x, jnp.int32(0)))[1]

        return run

    def fields_step(buf, lens_unused):
        # mirrors engine step_planes (uniform): decode + derive + cuts
        v = decode_fields(buf, QUAL_PLANES, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], L), 1)
        lengths = jnp.min(jnp.where(v == 0, lane, L), axis=1)
        five, three = compute_cuts_from_q(
            v.astype(jnp.int32) + (bias - offset), lengths, params,
            uniform_len=150)
        return three

    rows = packed.qual.shape[0] * reps
    rates = {}
    _salt = [12345]
    for name, kernel, x0 in (
        ("engine_planes", fields_step, fields0),
        ("engine_raw",
         lambda q, l: compute_cuts(q, q, l, params, uniform_len=150)[1],
         q0),
        ("jnp", lambda q, l: compute_cuts(q, q, l, params)[1], q0),
        ("pallas_uniform",
         lambda q, l: compute_cuts_pallas(q, q, l, params, tile_b=256,
                                          uniform_len=150)[1], q0),
    ):
        try:
            # marginal-cost chained timing with per-call unique salts
            # (round-4 methodology: the tunneled backend dedups identical
            # executions server-side, and single-depth totals carry fixed
            # overheads + chip co-tenancy noise; per-iter =
            # (T(K2)-T(K1))/(K2-K1), min of 3)
            K1, K2 = 64, 256
            r1 = make_run(kernel, K1)
            r2 = make_run(kernel, K2)
            _salt[0] += 1
            jax.block_until_ready(r1(x0, jnp.int32(_salt[0])))  # compile
            _salt[0] += 1
            jax.block_until_ready(r2(x0, jnp.int32(_salt[0])))

            def best(run):
                b = 1e9
                for _ in range(3):
                    _salt[0] += 1
                    s = jnp.int32(_salt[0])
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(x0, s))
                    b = min(b, time.perf_counter() - t0)
                return b

            per_iter = max((best(r2) - best(r1)) / (K2 - K1), 1e-9)
            rate = rows * L / per_iter / 1e9
            # sanity gate: this op-bound program cannot exceed ~100 GB/s
            # of logical u8 bytes on a v5e; a higher reading means the
            # chained loop was elided/cached rig-side (observed on the
            # tunneled backend) — record it as unreliable, never headline
            if rate > 100.0:
                log(f"device scan [{name}]: measurement unreliable "
                    f"({rate:.0f} GB/s computed — loop elided rig-side)")
                rates[name + "_unreliable"] = round(rate, 1)
                continue
            log(f"device scan [{name}]: {rate:.1f} GB/s "
                f"({per_iter * 1e3:.3f} ms per {rows>>10}k-row batch)")
            rates[name] = rate
        except Exception as e:
            log(f"device scan [{name}] skipped: {e}")
    return rates


def _backend():
    import jax

    return f"{jax.default_backend()}:{len(jax.devices())}"


if __name__ == "__main__":
    main()
