"""Data-parallel sharding regression via static per-device program cost.

Round 3 replaces the wall-clock overhead band: on the 8-device virtual CPU
mesh one physical core time-shares all devices and the runtime's scheduling
cost is itself batch- and dp-dependent, so no wall-clock normalization
isolates collective cost (round 2's ``t(n)/(n*t(1))`` produced impossible
"better than ideal" values; the per-sample slope ratio ranges 0.3-1.5 on
healthy shardings). The exact, jitter-free signal is the per-device cost of
the compiled SPMD program: XLA's cost analysis runs on the post-partitioning
module, so a correctly dp-sharded step keeps per-device FLOPs flat as dp
grows (collectives add ~1%), while a replicated-batch regression (e.g. an
accidental all-gather of the batch) multiplies them by dp.
"""

import importlib.util
import os


def _load_scaling():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "scaling.py",
    )
    spec = importlib.util.spec_from_file_location("bench_scaling", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dp8_static_per_device_flops_flat():
    import jax

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    scaling = _load_scaling()
    for name in scaling.SETUPS:
        c1 = scaling.static_per_device_cost(name, 1)
        c8 = scaling.static_per_device_cost(name, 8)
        ratio = c8["flops"] / c1["flops"]
        # Measured healthy: 1.01 (bigru), collectives only. A replicated
        # batch lands at ~8.
        assert ratio < 1.5, f"{name}: dp8 per-device flops ratio {ratio:.2f}"
        assert ratio > 0.67, f"{name}: dp8 per-device flops ratio {ratio:.2f}"
