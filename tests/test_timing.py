"""Tests for the honest-timing helpers (benchmarks/timing.py).

The in-graph mode runs the dependency chain inside one jitted fori_loop so
host dispatch load cannot contaminate the two-point slope (measured: eager
chains swung 549k-934k frames/s on the synthesis bench; the in-graph chain
reads 688.9k twice in a row, matching the profiler device span).
"""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from timing import chained_ms, dep  # noqa: E402


def _mm_step(a):
    @jax.jit
    def mm(c):
        return a @ c

    return mm


def test_in_graph_chain_executes_every_step():
    # x -> 2x per step; after n steps the value proves all steps ran and
    # were sequenced (the result is data-dependent on every iteration).
    x0 = jnp.ones((8, 128))

    def double(c):
        return c * 2.0

    ms, carry = chained_ms(
        double, x0, lambda c: float(c[0, 0]), n1=2, n2=10, repeats=1
    )
    # carry returned is the warmup carry (1 step)
    assert float(carry[0, 0]) == 2.0
    assert ms >= 0.0 or np.isfinite(ms)  # slope of a ~free op can jitter


def test_in_graph_and_eager_slopes_agree():
    a = jnp.asarray(
        np.random.default_rng(0).normal(size=(256, 256)).astype(np.float32)
        * 0.05
    )
    step = _mm_step(a)
    fetch = lambda c: float(c[0, 0])  # noqa: E731
    x0 = jnp.eye(256)
    ms_graph, _ = chained_ms(step, x0, fetch, n1=4, n2=40, repeats=3)
    ms_eager, _ = chained_ms(
        step, x0, fetch, n1=4, n2=40, repeats=3, in_graph=False
    )
    # Same op, same hardware: the two estimators must agree within noise
    # (CI hosts jitter; 3x is far tighter than the bugs this guards against:
    # a broken chain measures ~0, a non-fused loop measures dispatch).
    assert ms_graph > 0 and ms_eager > 0
    ratio = ms_graph / ms_eager
    assert 1 / 3 < ratio < 3, (ms_graph, ms_eager)


def test_non_traceable_step_falls_back_to_eager():
    calls = []

    def hostly(c):
        calls.append(1)  # side effect: impossible under tracing semantics
        return jnp.asarray(np.asarray(c) + 1.0)

    x0 = jnp.zeros((4, 4))
    ms, carry = chained_ms(
        hostly, x0, lambda c: float(c[0, 0]), n1=1, n2=4, repeats=1
    )
    assert np.isfinite(ms)
    # The eager fallback really iterated on the host.
    assert len(calls) >= 5


def test_dep_preserves_value_and_adds_dependency():
    x = jnp.arange(6.0).reshape(2, 3)
    s = jnp.float32(123.0)
    y = dep(x, s)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
