"""Logging / tracing.

The reference's observability is a compile-time debug macro ``msg()``
printing to stdout (on by default, /root/reference/src/sickle.h:99-108)
and ``error()`` to stderr (:113-120).  Here:

* ``msg()`` — debug prints, OFF by default (upstream-1.33-like quiet
  output), enabled by the CLI ``-d`` flag or ``set_debug(True)``;
* ``error()`` — stderr, same role as the reference's;
* structured ``logging`` logger for library users;
* ``Stopwatch`` — lightweight per-stage timing, reported by the engine
  when debug is on (the reference's only timing was wrapping invocations
  in ``time``, trim_all.py:71);
* device-side tracing is the CLI's ``--profile DIR`` (jax profiler).
"""

from __future__ import annotations

import logging
import sys
import time
from typing import Dict

_DEBUG = False
_logger = logging.getLogger("sickle_tpu")


def get_logger() -> logging.Logger:
    return _logger


def set_debug(on: bool) -> None:
    global _DEBUG
    _DEBUG = on
    _logger.setLevel(logging.DEBUG if on else logging.WARNING)


def msg(text: str) -> None:
    """Debug print (reference msg(), src/sickle.h:102-108)."""
    if _DEBUG:
        print(text)
        _logger.debug(text)


def error(text: str) -> None:
    """Error print to stderr (reference error(), src/sickle.h:113-120)."""
    sys.stderr.write(text + "\n")
    _logger.error(text)


class Stopwatch:
    """Accumulating per-stage wall-clock timers.

    Usage::

        sw = Stopwatch()
        with sw.time("pack"):
            ...
        sw.report()   # debug-only summary
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    class _Ctx:
        def __init__(self, sw: "Stopwatch", key: str):
            self.sw, self.key = sw, key

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.sw.totals[self.key] = self.sw.totals.get(self.key, 0.0) + dt
            self.sw.counts[self.key] = self.sw.counts.get(self.key, 0) + 1
            return False

    def time(self, key: str) -> "Stopwatch._Ctx":
        return Stopwatch._Ctx(self, key)

    def report(self) -> str:
        lines = [
            f"  {k}: {v:.3f}s over {self.counts[k]} calls"
            for k, v in sorted(self.totals.items())
        ]
        text = "stage timing:\n" + "\n".join(lines) if lines else "stage timing: (none)"
        msg(text)
        return text
