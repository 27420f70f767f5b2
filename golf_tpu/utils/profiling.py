"""Profiling / tracing / debugging subsystem.

The reference has only wall-clock RTF timing (``test_rtf.py:163-172``);
here the TPU-native superset: jax.profiler traces (viewable in
TensorBoard/Perfetto), per-op cost estimation from lowered HLO, and a
debug-nans switch (the analog of torch ``detect_anomaly``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/golf_tpu_trace"):
    """Capture a profiler trace around a block:

        with profiling.trace("/tmp/trace"):
            step_fn(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    """Trap NaNs at op granularity (torch detect_anomaly analog)."""
    jax.config.update("jax_debug_nans", enable)


def cost_analysis(fn: Callable, *args) -> Dict[str, Any]:
    """FLOPs / bytes-accessed estimate from the compiled executable."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {k: ca.get(k) for k in
            ("flops", "bytes accessed", "utilization operand 0 {}")
            if ca and k in ca} | {"raw": ca}


def timed(fn: Callable, *args, n: int = 10, warmup: int = 1) -> float:
    """Trimmed-mean wall time of a jitted callable (blocks on outputs)."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    if len(ts) > 2:
        ts = ts[1:-1]
    return sum(ts) / len(ts)
