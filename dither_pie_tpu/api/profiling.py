"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; the
TPU build adds jax.profiler annotations + per-stage wall-clock).

Usage:
    from dither_pie_tpu.api.profiling import stage, stage_report

    with stage("decode"):
        ...
    with stage("dither"):
        ...
    print(stage_report())

Set DITHER_PIE_TPU_TRACE_DIR to also capture a full XLA profiler trace
(viewable in TensorBoard / xprof) for the annotated region.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)

_TRACE_DIR = os.environ.get("DITHER_PIE_TPU_TRACE_DIR")
_trace_started = False


def _maybe_start_trace():
    global _trace_started
    if _TRACE_DIR and not _trace_started:
        import jax

        jax.profiler.start_trace(_TRACE_DIR)
        _trace_started = True


def stop_trace():
    global _trace_started
    if _trace_started:
        import jax

        jax.profiler.stop_trace()
        _trace_started = False


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Wall-clock a pipeline stage; annotates the device trace when active."""
    _maybe_start_trace()
    t0 = time.perf_counter()
    ctx = contextlib.nullcontext()
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        pass
    with ctx:
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _totals[name] += dt
        _counts[name] += 1


def stage_report() -> str:
    with _lock:
        lines = ["stage timings:"]
        for name in sorted(_totals, key=_totals.get, reverse=True):
            n = _counts[name]
            tot = _totals[name]
            lines.append(f"  {name:24s} {tot*1000:9.1f} ms total "
                         f"({n}x, {tot/n*1000:.1f} ms avg)")
    return "\n".join(lines)


def reset():
    with _lock:
        _totals.clear()
        _counts.clear()
