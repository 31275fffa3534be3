"""Profiler-trace artifact: device occupancy of the production train loop.

Runs a steady-state burst of donated BiGRU train steps over pre-staged
device batches (the hot path of train/loop.py: donate=True + device_put'd
batches) under jax.profiler.trace, then reports from the trace:

- per-step on-device time of the jitted train step,
- device BUSY FRACTION over the burst (union of all device-event spans /
  wall span between first and last device event) — the "does donate +
  prefetch keep the chip busy" number,

and keeps the raw trace under benchmarks/artifacts/ for inspection
(loadable in Perfetto / TensorBoard).

Run: cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site \
         python /root/repo/benchmarks/profile_train.py
"""

import glob
import gzip
import json
import os
import shutil

import numpy as np

STEPS = 30


def device_busy(events):
    """(busy_us, span_us) from the union of jitted-computation executions.

    Only 'jit_*' complete events count as busy — the trace also contains
    whole-span container/group events on the device pid that would trivially
    inflate a naive union to 100%.
    """
    iv = sorted(
        (e["ts"], e["ts"] + e["dur"])
        for e in events
        if e.get("ph") == "X"
        and str(e.get("name", "")).startswith("jit_")
        and "dur" in e
    )
    if not iv:
        return 0.0, 0.0
    span = max(b for _, b in iv) - iv[0][0]
    busy, end = 0.0, -np.inf
    for a, b in iv:
        if a > end:
            busy += b - a
            end = b
        elif b > end:
            busy += b - end
            end = b
    return busy, span


def main():
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.train.state import create_train_state
    from artspeech_tpu.train.step import make_artspeech_train_step

    rng = np.random.default_rng(0)
    B, T, NART = 12, 128, 10
    tokens = jnp.asarray(rng.integers(0, 64, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    model = ArtSpeech(vocab_size=64, n_articulators=NART, dropout=0.1)
    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-4)
    step = make_artspeech_train_step(to_mm=220.0, donate=True)
    batches = [
        {
            "tokens": jax.device_put(
                jnp.asarray(rng.integers(0, 64, (B, T)), jnp.int32)
            ),
            "targets": jax.device_put(
                jnp.asarray(rng.uniform(size=(B, T, NART, 2, 50)).astype(np.float32))
            ),
            "lengths": jax.device_put(lengths),
        }
        for _ in range(3)
    ]

    # compile + warm outside the trace
    state, m = step(state, batches[0], jax.random.PRNGKey(0))
    float(m["loss"])

    trace_dir = "/tmp/artspeech_train_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        loss = None
        for i in range(STEPS):
            state, m = step(state, batches[i % len(batches)], jax.random.PRNGKey(0))
            loss = m["loss"]
        final = float(loss)
    assert np.isfinite(final)

    traces = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    data = json.load(gzip.open(sorted(traces)[-1]))
    events = data["traceEvents"]
    busy, span = device_busy(events)

    step_durs = sorted(
        e["dur"]
        for e in events
        if e.get("ph") == "X" and str(e.get("name", "")).startswith("jit_train_step")
    )
    summary = {
        "steps": STEPS,
        "batch": {"B": B, "T": T, "n_articulators": NART},
        "donate": True,
        "device_step_ms_median": round(step_durs[len(step_durs) // 2] / 1e3, 3)
        if step_durs
        else None,
        "device_busy_fraction": round(busy / span, 3) if span else None,
        "busy_ms": round(busy / 1e3, 1),
        "span_ms": round(span / 1e3, 1),
        "dispatch_cadence_ms": round(span / 1e3 / max(STEPS - 1, 1), 2),
        "note": (
            "busy = union of jit_* executions. Through the axon tunnel each "
            "program dispatch costs several ms of host->device round trip, "
            "which bounds occupancy here; on a co-located production host "
            "dispatch is ~0.1ms and the same loop is device-bound "
            "(device_step_ms ~= cadence)."
        ),
    }
    out_dir = os.path.dirname(os.path.abspath(__file__))
    art_dir = os.path.join(out_dir, "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    shutil.copy(sorted(traces)[-1], os.path.join(art_dir, "train_trace.json.gz"))
    with open(os.path.join(out_dir, "profile_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
