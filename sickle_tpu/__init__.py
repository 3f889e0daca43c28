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

__version__ = "1.33.0"

__all__ = ["Compat", "QualityType", "__version__"]
