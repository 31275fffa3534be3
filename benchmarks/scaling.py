"""Data-parallel scaling measurement on the virtual CPU mesh.

This host exposes ONE physical core (see `nproc`), so 8 virtual XLA CPU
devices time-share it and a wall-clock speedup 1->8 is physically
impossible to observe here. What IS measurable — and what real-chip scaling
depends on — is whether sharding changes the *marginal cost per sample*.

Methodology (round 3 — replaces the old ``t(n) / (n * t(1))`` ratio, whose
denominator double-counted the fixed per-program cost n times and produced
impossible "better than ideal" values): for each dp size, time the jitted
step at two per-device batch sizes with dependency-chained iteration and
take the two-point slope over the added samples,

    per_sample(dp) = (t(dp, b2) - t(dp, b1)) / (dp * (b2 - b1))

The fixed per-step cost (dispatch, executable launch, fixed-size collective
latency) cancels in the subtraction — the same two-point trick timing.py
uses against the axon tunnel. On a serialized host the marginal cost of a
sample is sharding-independent unless the program adds per-sample
communication or re-materialization, so

    overhead(dp) = per_sample(dp) / per_sample(1)

~1.0 means batch-scaling collectives/resharding are free (an accidental
all-gather of the batch lands >> 1.5). Compile+execute of the same
shardings on a real multi-device mesh is separately validated by
__graft_entry__.dryrun_multichip. Matches the sharded-step semantics of
reference train_phoneme_to_articulation.py:45-121.

Run: PYTHONPATH=/root/repo python benchmarks/scaling.py
(re-execs itself with JAX_PLATFORMS=cpu / 8 virtual devices if needed).
Appends a section to BENCH_DETAILS.md and writes scaling.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_DEVICES = 8


def _ensure_cpu_mesh():
    """Re-exec under an 8-device CPU backend if this process can't provide it
    (the axon TPU plugin pins the backend at import time)."""
    if os.environ.get("_SCALING_CHILD") == "1":
        return True
    try:
        import jax

        if jax.default_backend() == "cpu" and len(jax.devices()) >= N_DEVICES:
            return True
    except Exception:
        pass  # e.g. JAX_PLATFORMS names a plugin not on PYTHONPATH
    env = dict(os.environ)
    env.update(
        _SCALING_CHILD="1",
        JAX_PLATFORMS="cpu",
        JAX_NUM_CPU_DEVICES=str(N_DEVICES),
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={N_DEVICES}").strip(),
    )
    # The TPU plugin's sitecustomize imports jax at interpreter startup and
    # pins the backend regardless of JAX_PLATFORMS — drop any PYTHONPATH
    # entry shipping a sitecustomize (same recipe as __graft_entry__.py).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and not os.path.exists(os.path.join(p, "sitecustomize.py"))
    )
    ret = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    sys.exit(ret.returncode)


def step_time_chained(step, state, batch, n1=2, n2=12, repeats=3):
    """Per-step seconds via dependency-chained iteration + two-point slope
    over iterations; min over repeats (scheduler jitter on a shared core
    only ever adds time)."""
    import jax

    def run(n):
        st, loss = state, None
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = step(st, batch, jax.random.PRNGKey(0))
            loss = m["loss"]
        float(loss)
        return time.perf_counter() - t0

    run(1)  # warm / compile
    return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(repeats))


def _bigru_setup(dp, b, seq, rng):
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import make_mesh, shard_batch
    from artspeech_tpu.train.state import create_train_state
    from artspeech_tpu.train.step import make_artspeech_train_step

    mesh = make_mesh(jax.devices()[:dp], model_parallel=1)
    model = ArtSpeech(vocab_size=32, n_articulators=4, dropout=0.0)
    tokens = jnp.asarray(rng.integers(0, 32, (b, seq)), jnp.int32)
    lengths = jnp.full((b,), seq, jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-4)
    state = distribute_state(state, mesh)
    batch = shard_batch(
        {
            "tokens": tokens,
            "targets": jnp.asarray(
                rng.uniform(size=(b, seq, 4, 2, 50)).astype(np.float32)
            ),
            "lengths": lengths,
        },
        mesh,
    )
    step = make_artspeech_train_step(to_mm=220.0, donate=False)
    return step, state, batch


def _recognizer_setup(dp, b, seq, rng):
    import jax
    import jax.numpy as jnp
    import optax

    from artspeech_tpu.models.deepspeech2 import DeepSpeech2
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import make_mesh, shard_batch
    from artspeech_tpu.train.recognition_step import make_recognition_train_step
    from artspeech_tpu.train.state import TrainState

    mesh = make_mesh(jax.devices()[:dp], model_parallel=1)
    # vocal-tract features + CTC; melspec adds nothing to the sharding
    # question and is slow on 1 CPU core.
    ds2 = DeepSpeech2(
        num_residual_layers=1, num_rnn_layers=1, rnn_hidden_size=16,
        num_classes=8, num_features=20, conv_channels=8,
    )
    feats = jnp.asarray(rng.normal(size=(b, 2, 20, seq)).astype(np.float32))
    in_len = jnp.full((b,), seq, jnp.int32)
    params = ds2.init(jax.random.PRNGKey(0), feats, lengths=in_len)["params"]
    state = TrainState.create(apply_fn=ds2.apply, params=params, tx=optax.adam(1e-4))
    state = distribute_state(state, mesh)
    batch = shard_batch(
        {
            "features": feats,
            "input_lengths": in_len,
            "ctc_target": jnp.asarray(rng.integers(1, 8, (b, 6)), jnp.int32),
            "ctc_target_lengths": jnp.full((b,), 6, jnp.int32),
        },
        mesh,
    )

    rstep = make_recognition_train_step(
        ds2, "ctc", "ctc_target", feature="vocal_tract", donate=False
    )
    return rstep, state, batch


def _transformer_setup(dp, b, seq, rng):
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.transformer import ArtSpeechTransformer
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import make_mesh, shard_batch
    from artspeech_tpu.train.state import create_train_state
    from artspeech_tpu.train.step import make_transformer_train_step

    mesh = make_mesh(jax.devices()[:dp], model_parallel=1)
    n_art, d = 4, 10
    model = ArtSpeechTransformer(
        vocab_size=16, num_articulators=n_art, embed_dim=16, num_heads=2,
        num_layers=1, num_feat=2 * d, encoder_ff_dim=32,
    )
    tokens = jnp.asarray(rng.integers(0, 16, (b, seq)), jnp.int32)
    lengths = jnp.full((b,), seq, jnp.int32)
    targets = jnp.asarray(
        rng.uniform(size=(b, seq, n_art, 2, d)).astype(np.float32)
    )
    tgt0 = targets.reshape(b, seq, n_art, 2 * d)
    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, tgt0), 1e-4)
    state = distribute_state(state, mesh)
    batch = shard_batch(
        {"tokens": tokens, "targets": targets, "lengths": lengths}, mesh
    )
    step = make_transformer_train_step(to_mm=220.0, donate=False)
    return step, state, batch


def _frame_ae_setup(dp, b, seq, rng):
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState

    from artspeech_tpu.models.autoencoder import (
        MultiArticulatorAutoencoder,
        normalize_indices_dict,
    )
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import make_mesh, shard_batch
    from artspeech_tpu.train.pc_step import make_autoencoder_train_step

    del seq  # frame model: no time axis
    mesh = make_mesh(jax.devices()[:dp], model_parallel=1)
    arts = ["tongue", "upper-lip", "lower-lip", "soft-palate"]
    indices = normalize_indices_dict({a: 2 for a in arts})
    d = 10
    model = MultiArticulatorAutoencoder(indices_dict=indices, in_features=2 * d)
    inputs = jnp.asarray(rng.normal(size=(b, len(arts), 2 * d)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.adam(1e-4))
    state = distribute_state(state, mesh)
    batch = shard_batch(
        {"inputs": inputs, "weights": jnp.ones((b,), np.float32)}, mesh
    )
    astep = make_autoencoder_train_step(
        model, indices, alpha=0.1,
        denorm_mean=jnp.zeros((len(arts), 2, d)),
        denorm_std=jnp.ones((len(arts), 2, d)),
        to_mm=220.0, donate=False,
    )

    @jax.jit  # jitted wrapper: static_per_device_cost needs .lower()
    def step(st, bt, rng_key):  # uniform (state, batch, rng) signature
        del rng_key
        return astep(st, bt)

    return step, state, batch


SETUPS = {
    "bigru": _bigru_setup,
    "recognizer": _recognizer_setup,
    "transformer": _transformer_setup,
    "frame_ae": _frame_ae_setup,
}


def static_per_device_cost(name, dp, per_device_batch=2, seq=16, seed=0):
    """Noise-free sharding check: per-device FLOPs/bytes of the compiled
    SPMD program (XLA cost analysis runs on the post-partitioning module).

    A correctly sharded dp step keeps per-device FLOPs flat as dp grows
    (collectives add ~1%); a replicated-batch regression multiplies them by
    dp. Unlike any wall-clock metric on a time-shared single core, this is
    exact and deterministic."""
    import jax

    rng = np.random.default_rng(seed)
    step, state, batch = SETUPS[name](dp, per_device_batch * dp, seq, rng)
    ca = step.lower(state, batch, jax.random.PRNGKey(0)).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return {"flops": float(ca["flops"]), "bytes": float(ca.get("bytes accessed", 0.0))}


def measure(dp_sizes=(1, 2, 4, 8), batch_pair=(2, 8), seq=32, seed=0):
    """Descriptive wall timing per dp size: chained step times at two
    per-device batch sizes and their per-sample slope.

    CAVEAT (why this is descriptive, not a soundness metric): on one
    time-shared core the runtime's scheduling cost per step is itself
    batch- and dp-dependent, so neither t(n)/(n*t(1)) (round 2's metric —
    produced impossible "better than ideal" values) nor the per-sample
    slope ratio isolates collective cost; measured healthy slopes range
    0.3-1.5x across dp. The sound regression signal is
    :func:`static_per_device_cost`."""
    rng = np.random.default_rng(seed)
    results = {name: {} for name in SETUPS}
    b1, b2 = batch_pair
    for name, setup in SETUPS.items():
        for dp in dp_sizes:
            times = {}
            for per_dev_b in (b1, b2):
                step, state, batch = setup(dp, per_dev_b * dp, seq, rng)
                times[per_dev_b] = step_time_chained(step, state, batch)
            results[name][dp] = {
                "step_s": times,
                "per_sample_s": (times[b2] - times[b1]) / (dp * (b2 - b1)),
            }
    return results


def main():
    _ensure_cpu_mesh()
    import jax

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= N_DEVICES

    flops_table = {}
    for name in SETUPS:
        flops_table[name] = {
            dp: static_per_device_cost(name, dp) for dp in (1, 2, 4, 8)
        }
    results = measure()

    out_dir = os.path.dirname(os.path.abspath(__file__))
    table = {"static": {}, "wall": {}}
    lines = [
        "\n## Data-parallel distribution cost (8-device virtual CPU mesh)\n",
        "\nSound metric — static per-device cost of the compiled SPMD program\n",
        "(XLA cost analysis, exact and jitter-free): flat FLOPs as dp grows\n",
        "means the batch really is sharded and collectives are the only\n",
        "addition; a replicated-batch bug multiplies FLOPs by dp.\n",
        "\n| model | dp | per-device MFLOPs | vs dp=1 | per-device MB | vs dp=1 |\n",
        "|---|---|---|---|---|---|\n",
    ]
    for name, by_dp in flops_table.items():
        base = by_dp[1]
        table["static"][name] = {}
        for dp, c in sorted(by_dp.items()):
            fr = c["flops"] / base["flops"]
            br = c["bytes"] / base["bytes"] if base["bytes"] else float("nan")
            table["static"][name][dp] = {
                "mflops": round(c["flops"] / 1e6, 1),
                "flops_ratio": round(fr, 3),
                "mbytes": round(c["bytes"] / 1e6, 1),
                "bytes_ratio": round(br, 3),
            }
            lines.append(
                f"| {name} | {dp} | {c['flops'] / 1e6:.1f} | {fr:.3f} "
                f"| {c['bytes'] / 1e6:.1f} | {br:.3f} |\n"
            )
    lines += [
        "\nDescriptive wall timing (min-of-3 chained two-point slopes over\n",
        "per-device batch 2 -> 8). On one time-shared core the runtime's\n",
        "scheduling cost is itself batch- and dp-dependent, so these slopes\n",
        "do NOT isolate collective cost (measured healthy range 0.3-1.5x) —\n",
        "they are recorded for drift watching only; the table above is the\n",
        "regression signal (see scaling.py docstrings).\n",
        "\n| model | dp | step ms (b/dev=2) | step ms (b/dev=8) | per-sample ms |\n",
        "|---|---|---|---|---|\n",
    ]
    for name, by_dp in results.items():
        table["wall"][name] = {}
        for dp, r in sorted(by_dp.items()):
            table["wall"][name][dp] = {
                "per_sample_ms": round(r["per_sample_s"] * 1e3, 3),
            }
            # Keys come from measure()'s batch_pair, not hardcoded 2/8.
            b_lo, b_hi = sorted(r["step_s"])
            lines.append(
                f"| {name} | {dp} | {r['step_s'][b_lo] * 1e3:.2f} "
                f"| {r['step_s'][b_hi] * 1e3:.2f} "
                f"| {r['per_sample_s'] * 1e3:.3f} |\n"
            )
    with open(os.path.join(out_dir, "scaling.json"), "w") as f:
        json.dump(table, f, indent=2)
    # SCALING.md is the persistent artifact run_all.py inlines on rewrite;
    # update BENCH_DETAILS.md in place too (replacing any prior section).
    with open(os.path.join(out_dir, "SCALING.md"), "w") as f:
        f.writelines(lines)
    details_path = os.path.join(out_dir, "BENCH_DETAILS.md")
    if os.path.exists(details_path):
        with open(details_path) as f:
            details = f.read()
        marker = "\n## Data-parallel distribution cost"
        if marker in details:
            details = details[: details.index(marker)]
        with open(details_path, "w") as f:
            f.write(details + "".join(lines))
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
