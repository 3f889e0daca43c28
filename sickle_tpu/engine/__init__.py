"""Batching pipeline: chunked streaming read -> device -> ordered write.

The reference's per-batch fork/join orchestration with a detached writer
thread (src/trim_single.cpp:239-345, src/trim_paired.cpp:280-458 — and its
use-after-free races, SURVEY.md §2.4.3) becomes a three-stage pipeline with
deterministic, order-preserving output: a prefetch thread packs record-
aligned chunks, the main thread dispatches async device computation, and a
single writer thread materializes results in dispatch order.
"""

from .chunker import iter_record_chunks
from .pipeline import EngineConfig, run_pe, run_se

__all__ = ["EngineConfig", "iter_record_chunks", "run_pe", "run_se"]
