#!/usr/bin/env python
"""One-line tunneled-TPU link state probe.

Prints per-RPC latency (128-int32 probe) and byte-regime rate (1 MB
probe).  Interpreting the pair (PERF_NOTES.md link model):

* kb < 5 ms and 1mb < 15 ms  -> fast window; safe to measure
* kb ~25-45 ms               -> per-RPC fine regime (byte budget spent)
* kb in the seconds          -> penalty box; idle until it drains

The probe itself costs ~1 MB of the cumulative-byte budget — loop it on
20+ minute intervals, not in a tight loop.
"""

import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    probe = jax.jit(lambda x: (x + 1).sum())
    t0 = time.perf_counter()
    jax.block_until_ready(probe(jnp.zeros((128,), jnp.int32)))
    kb = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(probe(np.zeros((1 << 18,), np.int32)))
    mb = time.perf_counter() - t0
    state = ("fast-window" if kb < 0.005 and mb < 0.015
             else "fine-regime" if kb < 0.1
             else "penalty-box")
    print(f"{time.strftime('%H:%M:%S')} backend={jax.default_backend()} "
          f"kb={kb * 1e3:.1f}ms 1mb={mb * 1e3:.1f}ms state={state}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
