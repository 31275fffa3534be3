"""Profiling and step-time instrumentation.

The reference has no tracing/profiling (SURVEY.md §5 — tqdm postfixes only).
TPU-native replacements: the JAX profiler (XLA traces viewable in
TensorBoard/Perfetto) plus a lightweight step timer with device sync.
"""

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Synchronized step timing with running statistics."""

    sync: bool = True
    times_ms: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None and self.sync:
            jax.block_until_ready(result)
        if self._t0 is not None:
            self.times_ms.append((time.perf_counter() - self._t0) * 1e3)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        out = {}
        try:
            yield out
        finally:
            self.stop(out.get("result"))

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.times_ms:
            return {}
        arr = np.asarray(self.times_ms)
        return {
            "steps": int(arr.size),
            "mean_ms": float(arr.mean()),
            "median_ms": float(np.median(arr)),
            "p90_ms": float(np.percentile(arr, 90)),
            "min_ms": float(arr.min()),
        }


def log_compile_time(fn, *args, label: str = "fn"):
    """Run ``fn`` once, reporting (compile+run, steady-state) seconds."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    steady_s = time.perf_counter() - t0
    print(f"[{label}] compile+run {compile_s:.2f}s, steady {steady_s * 1e3:.2f}ms")
    return out
