#!/usr/bin/env python
"""Compiled-on-TPU kernel verification + timing artifact.

Runs BOTH trimming kernels — the fused jnp formulation (ops/trim.py) and
the single-pass Pallas kernel (ops/trim_pallas.py) — compiled on the real
TPU, asserts their (five, three, first_bad) outputs are identical on the
bundled fixture across configs, times them device-resident, and writes a
JSON artifact (VERDICT r1 item 4: the Pallas claim must be checkable, not
a docstring).

Usage: python tools/tpu_kernel_verify.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path: str = "PALLAS_TPU.json") -> int:
    import jax
    import numpy as np

    from sickle_tpu.constants import Compat, QualityType
    from sickle_tpu.io.fastq import pack_fastq
    from sickle_tpu.ops import TrimParams, compute_cuts_jit
    from sickle_tpu.ops.trim_pallas import compute_cuts_pallas

    backend = jax.default_backend()
    data = open("/root/reference/test/test.fastq", "rb").read()
    packed = pack_fastq(data, batch_multiple=256, need_seq=True)
    seq = jax.device_put(packed.seq)
    qual = jax.device_put(packed.qual)
    lengths = jax.device_put(packed.lengths.astype(np.int32))

    configs = [
        TrimParams(qualtype=QualityType.SANGER, qual_threshold=60,
                   compat=Compat.FORK),
        TrimParams(qualtype=QualityType.SANGER, qual_threshold=20),
        TrimParams(qualtype=QualityType.SANGER, qual_threshold=30,
                   trunc_n=True),
        TrimParams(qualtype=QualityType.SANGER, qual_threshold=40,
                   no_fiveprime=True),
    ]
    results = {"backend": backend, "batch": list(packed.qual.shape),
               "n_records": packed.n_records, "configs": [], "equal": True}
    for p in configs:
        a = [np.asarray(x) for x in compute_cuts_jit(seq, qual, lengths, p)]
        b = [np.asarray(x) for x in
             compute_cuts_pallas(seq, qual, lengths, p, tile_b=256)]
        # round-4 uniform-length (static window) variants, both backends
        c = [np.asarray(x) for x in
             compute_cuts_jit(seq, qual, lengths, p, uniform_len=150)]
        d = [np.asarray(x) for x in
             compute_cuts_pallas(seq, qual, lengths, p, tile_b=256,
                                 uniform_len=150)]
        eq = all(np.array_equal(a[k], v[k])
                 for v in (b, c, d) for k in (0, 1))
        eq_bad = all(bool(np.array_equal(a[2] < packed.lengths,
                                         v[2] < packed.lengths))
                     for v in (b, c, d))
        results["configs"].append({
            "qual_threshold": p.qual_threshold,
            "trunc_n": p.trunc_n, "no_fiveprime": p.no_fiveprime,
            "cuts_equal": bool(eq), "bad_flags_equal": eq_bad,
            "variants": "jnp, pallas, jnp-uniform, pallas-uniform",
        })
        results["equal"] &= eq and eq_bad

    def rate(fn, iters=30):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        return dt * 1e3, packed.qual.size / dt / 1e9

    p = configs[0]
    ms_j, gb_j = rate(lambda: compute_cuts_jit(seq, qual, lengths, p))
    ms_p, gb_p = rate(
        lambda: compute_cuts_pallas(seq, qual, lengths, p, tile_b=256))
    results["jnp"] = {"ms_per_batch": round(ms_j, 3), "gb_per_s": round(gb_j, 1),
                      "note": "per-call; RPC-latency-bound on tunneled link"}
    results["pallas"] = {"ms_per_batch": round(ms_p, 3),
                         "gb_per_s": round(gb_p, 1),
                         "note": "per-call; RPC-latency-bound on tunneled link"}

    # true device rate: chained kernel invocations inside ONE jit call
    # (each iteration's input depends on the previous output), measured
    # by MARGINAL COST between two chain depths with per-call unique
    # salts.  Round-4 methodology findings on this rig, each rule from a
    # recorded confound:
    #  * repeat calls with IDENTICAL (program, args) return near-
    #    instantly — the tunneled backend dedups executions server-side,
    #    so every timed call gets a unique salt folded into the input;
    #  * single-depth totals carry multi-ms fixed overheads and chip
    #    co-tenancy noise (the same program measured 0.25-0.8 ms/iter
    #    across minutes); per-iter = (T(K2) - T(K1)) / (K2 - K1), min
    #    over repeats, subtracts both.
    import jax.numpy as jnp
    from jax import lax

    from sickle_tpu.ops.trim import compute_cuts
    from sickle_tpu.ops.trim_pallas import compute_cuts_pallas as pallas_raw

    B, L = 1 << 16, 152
    K1, K2 = 64, 256
    reps = B >> 11
    small = packed.qual[: 1 << 11]
    small_len = packed.lengths[: 1 << 11].astype(np.int32)
    salt_box = {"v": 1000}

    def chained(kernel_fn):
        # tile the resident batch to 64k rows ON DEVICE: the tunneled
        # link carries one 312 KB transfer regardless of batch size
        def make(K):
            @jax.jit
            def run(q_small, salt):
                q = jnp.tile(q_small, (reps, 1))
                q = q.at[0, 1].set((salt & 0x1f).astype(jnp.uint8) + 66)
                lens = jnp.tile(small_len_dev, reps)

                def body(i, carry):
                    q, acc = carry
                    five, three, bad = kernel_fn(q, q, lens)
                    q = q.at[0, 0].set((three[0] % 60 + 33).astype(jnp.uint8))
                    return q, acc + three.sum()

                return lax.fori_loop(0, K, body, (q, jnp.int32(0)))[1]

            return run

        def best_total(run, repeats=3):
            best = 1e9
            for _ in range(repeats):
                salt_box["v"] += 1
                s = jnp.int32(salt_box["v"])
                t0 = time.perf_counter()
                jax.block_until_ready(run(small_dev, s))
                best = min(best, time.perf_counter() - t0)
            return best

        r1, r2 = make(K1), make(K2)
        salt_box["v"] += 1
        jax.block_until_ready(r1(small_dev, jnp.int32(salt_box["v"])))
        salt_box["v"] += 1
        jax.block_until_ready(r2(small_dev, jnp.int32(salt_box["v"])))
        t1, t2 = best_total(r1), best_total(r2)
        per_iter = max((t2 - t1) / (K2 - K1), 1e-9)
        return per_iter * 1e3, small.size * reps / per_iter / 1e9

    small_dev = jax.device_put(small)
    small_len_dev = jax.device_put(small_len)
    for name, kfn in (
        ("jnp_device", lambda s, q, l: compute_cuts(s, q, l, p)),
        ("jnp_uniform_device",
         lambda s, q, l: compute_cuts(s, q, l, p, uniform_len=150)),
        ("pallas_device",
         lambda s, q, l: pallas_raw(s, q, l, p, tile_b=256)),
        ("pallas_uniform_device",
         lambda s, q, l: pallas_raw(s, q, l, p, tile_b=256,
                                    uniform_len=150)),
        ("pallas_uniform_tile512",
         lambda s, q, l: pallas_raw(s, q, l, p, tile_b=512,
                                    uniform_len=150)),
        ("pallas_uniform_tile1024",
         lambda s, q, l: pallas_raw(s, q, l, p, tile_b=1024,
                                    uniform_len=150)),
    ):
        try:
            ms, gb = chained(kfn)
            entry = {"ms_per_64k_batch": round(ms, 4),
                     "gb_per_s": round(gb, 1)}
            if gb > 100:  # op-bound ceiling ~100 GB/s: loop was elided
                entry["unreliable"] = "chained loop elided/cached rig-side"
            results[name] = entry
        except Exception as e:  # record, don't abort the artifact
            results[name] = {"error": str(e)[:300]}

    # the ENGINE's actual headline device program: field-wire decode +
    # derive-lengths + uniform-window cuts (engine step_planes)
    try:
        from sickle_tpu.io.fastq import QUAL_PLANES, qual_fields, qual_minmax
        from sickle_tpu.ops.trim import compute_cuts_from_q, decode_fields

        mn, _ = qual_minmax(small)
        bias = mn - 1
        planes_dev = jax.device_put(qual_fields(small, bias))

        def planes_step(buf):
            v = decode_fields(buf, QUAL_PLANES, L)
            lane = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], L), 1)
            lengths = jnp.min(jnp.where(v == 0, lane, L), axis=1)
            five, three = compute_cuts_from_q(
                v.astype(jnp.int32) + (bias - 33), lengths, p,
                uniform_len=150)
            return five, three, three

        def make_p(K):
            @jax.jit
            def run(x, salt):
                xx = jnp.tile(x, (reps, 1))
                xx = xx.at[0, 1].set((salt & 0x1f).astype(jnp.uint8))

                def body(i, carry):
                    xx, acc = carry
                    five, three, _ = planes_step(xx)
                    xx = xx.at[0, 0].set((three[0] % 60).astype(jnp.uint8))
                    return xx, acc + three.sum() + five.sum()

                return lax.fori_loop(0, K, body, (xx, jnp.int32(0)))[1]

            return run

        def best_total_p(run, repeats=3):
            best = 1e9
            for _ in range(repeats):
                salt_box["v"] += 1
                s = jnp.int32(salt_box["v"])
                t0 = time.perf_counter()
                jax.block_until_ready(run(planes_dev, s))
                best = min(best, time.perf_counter() - t0)
            return best

        r1, r2 = make_p(K1), make_p(K2)
        salt_box["v"] += 1
        jax.block_until_ready(r1(planes_dev, jnp.int32(salt_box["v"])))
        salt_box["v"] += 1
        jax.block_until_ready(r2(planes_dev, jnp.int32(salt_box["v"])))
        per_iter = max((best_total_p(r2) - best_total_p(r1)) / (K2 - K1),
                       1e-9)
        gbp = small.size * reps / per_iter / 1e9
        entry = {
            "ms_per_64k_batch": round(per_iter * 1e3, 4),
            "gb_per_s": round(gbp, 1),
            "note": "decode field wire (4+2-bit subfields) + derive lengths + uniform cuts",
        }
        if gbp > 100:  # op-bound ceiling: the chained loop was elided
            entry["unreliable"] = "chained loop elided/cached rig-side"
        results["engine_planes_device"] = entry
    except Exception as e:
        results["engine_planes_device"] = {"error": str(e)[:300]}
    results["methodology"] = (
        "marginal-cost chained timing: per-iter = (T(K=256)-T(K=64))/192, "
        "min of 3, per-call unique salts (the tunneled backend dedups "
        "identical executions server-side; single-depth totals carry "
        "fixed overheads and co-tenancy noise)")
    results["date"] = time.strftime("%Y-%m-%d")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0 if results["equal"] else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
