"""Data-parallel scaling measurement on the virtual CPU mesh.

This host exposes ONE physical core (see `nproc`), so 8 virtual XLA CPU
devices time-share it and a wall-clock speedup 1->8 is physically
impossible to observe here. What IS measurable — and what real-chip scaling
depends on — is the *distribution overhead*:

    overhead(n) = t(dp=n, global batch = n*b) / (n * t(dp=1, batch=b))

On a serialized host the numerator contains n devices' worth of compute
plus all collective/resharding cost, so overhead ~1.0 means the sharded
program adds negligible communication and per-device work is unchanged —
i.e. per-device throughput is flat 1->8 and real chips scale linearly
(compile+execute of the same shardings on an 8-device mesh is separately
validated by __graft_entry__.dryrun_multichip). Matches the sharded-step
semantics of reference train_phoneme_to_articulation.py:45-121.

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


def step_time_chained(step, state, batch, n1=2, n2=12):
    """Per-step seconds via dependency-chained iteration + two-point slope."""
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
    return (run(n2) - run(n1)) / (n2 - n1)


def measure(dp_sizes=(1, 2, 4, 8), per_device_batch=2, seq=32, seed=0):
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.models.deepspeech2 import DeepSpeech2
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import make_mesh, shard_batch
    from artspeech_tpu.train.recognition_step import make_recognition_train_step
    from artspeech_tpu.train.state import TrainState, create_train_state
    from artspeech_tpu.train.step import make_artspeech_train_step
    import optax

    rng = np.random.default_rng(seed)
    results = {"bigru": {}, "recognizer": {}}

    for dp in dp_sizes:
        b = per_device_batch * dp
        mesh = make_mesh(jax.devices()[:dp], model_parallel=1)

        # --- BiGRU ---
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
        results["bigru"][dp] = step_time_chained(step, state, batch)

        # --- recognizer (vocal-tract features + CTC; melspec adds nothing
        # to the sharding question and is slow on 1 CPU core) ---
        t_rec = seq
        ds2 = DeepSpeech2(
            num_residual_layers=1, num_rnn_layers=1, rnn_hidden_size=16,
            num_classes=8, num_features=20, conv_channels=8,
        )
        feats = jnp.asarray(rng.normal(size=(b, 2, 20, t_rec)).astype(np.float32))
        in_len = jnp.full((b,), t_rec, jnp.int32)
        params = ds2.init(jax.random.PRNGKey(0), feats, lengths=in_len)["params"]
        rstate = TrainState.create(apply_fn=ds2.apply, params=params, tx=optax.adam(1e-4))
        rstate = distribute_state(rstate, mesh)
        rbatch = shard_batch(
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
        results["recognizer"][dp] = step_time_chained(rstep, rstate, rbatch)

    return results


def main():
    _ensure_cpu_mesh()
    import jax

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= N_DEVICES
    results = measure()

    out_dir = os.path.dirname(os.path.abspath(__file__))
    table = {}
    lines = [
        "\n## Data-parallel distribution overhead (8-device virtual CPU mesh)\n",
        "\nOne physical host core serializes all virtual devices, so ideal dp=n",
        "\ncost is n x the dp=1 step; `overhead = t(n) / (n * t(1))` isolates the",
        "\ncollective/resharding cost (1.0 = free distribution; see scaling.py).\n",
        "\n| model | dp | step ms | per-device ms | overhead vs ideal |\n",
        "|---|---|---|---|---|\n",
    ]
    for name, times in results.items():
        t1 = times[1]
        table[name] = {}
        for dp, t in sorted(times.items()):
            ov = t / (dp * t1)
            table[name][dp] = {"step_ms": round(t * 1e3, 2), "overhead": round(ov, 3)}
            lines.append(
                f"| {name} | {dp} | {t * 1e3:.2f} | {t * 1e3 / dp:.2f} | {ov:.3f} |\n"
            )
    with open(os.path.join(out_dir, "scaling.json"), "w") as f:
        json.dump(table, f, indent=2)
    with open(os.path.join(out_dir, "BENCH_DETAILS.md"), "a") as f:
        f.writelines(lines)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
