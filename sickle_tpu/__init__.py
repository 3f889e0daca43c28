"""sickle-tpu: a TPU-native windowed adaptive read-trimming framework.

A from-scratch rebuild of sickle 1.33's capabilities (reference:
pentalpha/sickle) designed TPU-first: host-side C++/numpy FASTQ ingestion and
packing, a JAX/Pallas kernel for the sliding-window quality scan, shard_map
data parallelism over device meshes, and a drop-in ``sickle se|pe`` CLI.
"""

from .constants import Compat, QualityType

# keep freed memory in-heap: fresh page faults are pathologically slow in
# some sandboxes (~400us each); warm reuse is the universal win (io/native.py)
from .io.native import tune_malloc as _tune_malloc

_tune_malloc()


def _enable_jax_compilation_cache() -> None:
    """Persist XLA compilations across processes (remote TPU compiles in
    some environments take 60-120s each; the cache makes them one-time)."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "SICKLE_TPU_JAX_CACHE", os.path.expanduser("~/.cache/sickle_tpu_jax")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_jax_compilation_cache()

__version__ = "1.33.0"

__all__ = ["Compat", "QualityType", "__version__"]
