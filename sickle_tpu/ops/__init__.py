"""Device compute: the vectorized sliding-window trimming kernels.

``trim`` is the reference jnp formulation (XLA-fused, used for correctness
and as the default path); ``trim_pallas`` is the hand-fused Pallas TPU
kernel for the hot path.  Both compute identical results and are
property-tested against the scalar oracle.
"""

from .trim import TrimParams, compute_cuts, compute_cuts_jit, decode_check

__all__ = ["TrimParams", "compute_cuts", "compute_cuts_jit", "decode_check"]
