"""Multi-chip / multi-host data parallelism.

The reference's only parallelism is pthreads round-robin over queues in
one process (SURVEY.md §2.2).  Here the equivalent is a ``data`` mesh
axis: read batches are sharded row-wise over all chips with ``shard_map``
(reads are embarrassingly parallel — no cross-chip traffic on the read
path by construction), and only scalar counters are combined, via
``psum`` over ICI/DCN in the multi-host path (``dist``).
"""

from .mesh import data_mesh, sharded_cuts_fn

__all__ = ["data_mesh", "sharded_cuts_fn"]
