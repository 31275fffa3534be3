"""Honest device timing under the axon TPU tunnel.

Through the axon plugin, ``jax.block_until_ready`` returns WITHOUT waiting
for device completion — only an actual host fetch of a pending value
synchronizes (measured: an 8192^3 f32 matmul "completes" in 0.03ms under
block_until_ready but takes 31ms when the scalar result is fetched; a fetch
of a pending value costs ~25ms tunnel round-trip). Any timing loop built on
block_until_ready therefore measures dispatch latency, not device time.

This module times a *dependency-chained* iteration instead: each step's
input depends on the previous step's output, so the device must execute
every step, and one scalar fetch at the end forces completion of the whole
chain. The fixed fetch/RTT cost is removed with a two-point slope:

    ms_per_iter = (T(n2 iters + fetch) - T(n1 iters + fetch)) / (n2 - n1)

which is exact for any constant per-measurement overhead.
"""

import sys
import time


def make_in_graph_chain(step):
    """Jit ``step`` iterated n times inside one ``lax.fori_loop``.

    Returns ``chain_n(carry, n) -> carry`` with ``n`` a traced loop bound
    (one compiled program for every n). Raises at call time if ``step`` is
    not jit-traceable.
    """
    import jax

    @jax.jit
    def chain_n(c, n):
        return jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)

    return chain_n


def chained_ms(step, carry0, fetch, n1=4, n2=None, target_ms=80.0, repeats=3,
               in_graph=True):
    """Median per-iteration wall time (ms) of a dependency-chained step.

    Args:
        step: carry -> carry; must make the next input data-depend on the
            previous output (e.g. ``x + 0 * prev_scalar``) so the runtime
            cannot reorder or skip work.
        carry0: initial device carry (already warm/compiled inputs are fine;
            the first chained call is used as warmup and discarded).
        fetch: carry -> float; a tiny host fetch that forces completion.
        n1: short-chain length.
        n2: long-chain length; if None, sized so the long chain spans
            ~target_ms of device work (>= n1 + 16).
        repeats: slope is measured this many times; median returned.
        in_graph: run the n-iteration chain inside ONE jitted
            ``lax.fori_loop`` (n is a traced bound: one compile) so a loaded
            host cannot inflate the slope with per-iteration dispatch cost —
            the eager per-call chain measured up to 1.4x slow under host
            load. Falls back to the eager chain (with a stderr warning) when
            the loop program fails to build. Costs one extra compile per
            call (the loop-wrapped program; the persistent compilation
            cache amortizes reruns). CAUTION: chains whose anchor is a
            single element (``out.ravel()[0]``) must switch to a full
            reduction (``out.sum()``) — inside one program XLA may
            dead-code-eliminate work that feeds no loop output.
    Returns:
        (ms_per_iter, carry) — the carry is returned so callers can fetch
        values or chain further measurements.
    """
    carry = step(carry0)
    fetch(carry)  # compile + warm

    run_n = None
    if in_graph:
        chain_n = make_in_graph_chain(step)
        try:
            warm = chain_n(carry, 2)
            fetch(warm)

            def run_n(n):
                t0 = time.perf_counter()
                fetch(chain_n(carry, n))
                return time.perf_counter() - t0

        except Exception as e:
            # Any failure (non-traceable step, carry dtype mismatch, loop
            # compile OOM) downgrades to the eager chain — say so loudly:
            # an eager row silently mixed into an in-graph table reads as a
            # regression that is pure methodology skew.
            print(
                f"[timing] in-graph chain failed ({type(e).__name__}: {e}); "
                "falling back to the EAGER chain — this row includes "
                "per-iteration host dispatch",
                file=sys.stderr,
            )
            run_n = None

    if run_n is None:

        def run_n(n):
            c = carry
            t0 = time.perf_counter()
            for _ in range(n):
                c = step(c)
            fetch(c)
            return time.perf_counter() - t0

    if n2 is None:
        # Slope-based rough estimate: a single run_n(8)/8 includes the fixed
        # fetch/RTT cost (~25ms through the tunnel), which swamps tiny
        # kernels and under-sizes n2 so badly the final slope can go
        # negative on noise. Differencing two chain lengths removes it.
        t8 = run_n(8)
        t24 = run_n(24)
        rough = max((t24 - t8) / 16.0, 1e-6)
        n2 = n1 + max(16, min(4096, int(target_ms * 1e-3 / rough)))

    slopes = []
    for _ in range(repeats):
        t_short = run_n(n1)
        t_long = run_n(n2)
        slopes.append((t_long - t_short) / (n2 - n1))
    slopes.sort()
    return float(slopes[len(slopes) // 2] * 1e3), carry


def dep(x, scalar):
    """Make ``x`` data-depend on ``scalar`` without changing its value."""
    return x + (scalar * 0).astype(x.dtype)


def profile_ms(step, carry0, fetch, iters=6):
    """Median on-DEVICE milliseconds of the dominant jitted computation per
    chained iteration, from a jax.profiler trace.

    The wall-clock slope (chained_ms) includes the tunnel's per-program
    dispatch cost (~1-4ms, drifts run-to-run); the profiler records actual
    TPU execution spans, which is the production-representative number.
    Returns (median_ms, event_name) for the longest-total 'jit_*' device
    event, or (None, None) if the trace exposes no device events (e.g. CPU
    backend).
    """
    import glob
    import gzip
    import json
    import os
    import tempfile

    import jax

    carry = step(carry0)
    fetch(carry)  # compile + warm outside the trace
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(tmp):
        c = carry
        for _ in range(iters):
            c = step(c)
        fetch(c)

    traces = glob.glob(os.path.join(tmp, "plugins", "profile", "*", "*.trace.json.gz"))
    if not traces:
        return None, None
    data = json.load(gzip.open(sorted(traces)[-1]))
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "device:" in str(e.get("args", {}).get("name", ""))
        and "CPU" not in str(e.get("args", {}).get("name", ""))
    }
    per_name = {}
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("pid") in device_pids
            and str(e.get("name", "")).startswith("jit_")
            and "dur" in e
        ):
            per_name.setdefault(e["name"], []).append(e["dur"])
    if not per_name:
        return None, None
    name, durs = max(per_name.items(), key=lambda kv: sum(kv[1]))
    durs.sort()
    return durs[len(durs) // 2] / 1e3, name
