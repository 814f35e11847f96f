"""Lightweight stage timers for the prediction pipeline.

The reference has only coarse wall-clock prints (src/augustus.cc:126-131);
production here needs a per-stage breakdown (prep / track build / pack /
device DP / traceback / gene projection / printing) so regressions are
attributable.  Enabled by calling `reset(True)`; `predict` and the engines
call `add(name, seconds)` unconditionally (a dict add when enabled, a no-op
otherwise).  bench.py prints the table.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict

_ENABLED = False
TIMES: Dict[str, float] = {}


def reset(enabled: bool = True) -> None:
    global _ENABLED
    _ENABLED = enabled
    TIMES.clear()


def add(name: str, seconds: float) -> None:
    if _ENABLED:
        TIMES[name] = TIMES.get(name, 0.0) + seconds


@contextmanager
def stage(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        add(name, time.time() - t0)


def report() -> str:
    total = sum(TIMES.values())
    parts = [f"{k}={v:.2f}s" for k, v in
             sorted(TIMES.items(), key=lambda kv: -kv[1])]
    return f"stages({total:.2f}s tracked): " + " ".join(parts)
