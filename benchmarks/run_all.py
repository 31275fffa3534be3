"""Detailed benchmark suite: kernels, train steps, synthesis, data path.

Writes BENCH_DETAILS.md (markdown table) + bench_details.json next to this
file. Run on the target hardware:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/run_all.py
"""

import json
import os
import time

import numpy as np


def timeit(fn, *args, iters=20, warmup=1):
    import jax

    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def timeit_varied(fn, args_list, iters=40):
    """Amortized timing over cycled distinct inputs — defeats any
    same-operand dispatch fast paths when comparing kernels."""
    import jax

    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for k in range(iters):
        out = fn(*args_list[k % len(args_list)])
    jax.block_until_ready(out)
    return float((time.perf_counter() - t0) / iters * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    try:
        from artspeech_tpu.cli.common import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    device = str(jax.devices()[0])
    rows = []

    def add(name, ms, detail):
        rows.append({"benchmark": name, "median_ms": round(ms, 3), "detail": detail})
        print(f"{name}: {ms:.3f}ms ({detail})")

    rng = np.random.default_rng(0)

    # --- P2CP kernels ---
    from artspeech_tpu.ops.distances import _mean_p2cp_xla
    from artspeech_tpu.ops.pallas_kernels import mean_p2cp_pallas

    mk = lambda: jnp.asarray(rng.normal(size=(16, 128, 11, 50, 2)).astype(np.float32))
    pairs = [(mk(), mk()) for _ in range(4)]
    add("p2cp_xla", timeit_varied(jax.jit(_mean_p2cp_xla), pairs), "(16,128,11,50,2) varied inputs")
    add("p2cp_pallas", timeit_varied(jax.jit(mean_p2cp_pallas), pairs), "(16,128,11,50,2) varied inputs")

    # --- BiGRU train step ---
    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.train.state import create_train_state
    from artspeech_tpu.train.step import make_artspeech_train_step

    for b in (12, 256):
        model = ArtSpeech(vocab_size=64, n_articulators=10, dropout=0.1)
        tokens = jnp.asarray(rng.integers(0, 64, (b, 128)), jnp.int32)
        lengths = jnp.full((b,), 128, jnp.int32)
        targets = jnp.asarray(rng.uniform(size=(b, 128, 10, 2, 50)).astype(np.float32))
        state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-4)
        step = make_artspeech_train_step(to_mm=220.0, donate=False)
        batch = {"tokens": tokens, "targets": targets, "lengths": lengths}
        ms = timeit(lambda s: step(s, batch, jax.random.PRNGKey(0))[1]["loss"], state)
        add(f"bigru_train_step_b{b}", ms, f"B={b} T=128, {b * 128 / ms * 1e3:,.0f} frames/s")

    # --- fused synthesis pipeline ---
    from artspeech_tpu.core import constants as C
    from artspeech_tpu.geometry import generate_vocal_tract_tube_batch, tube_area_function
    from artspeech_tpu.ops.bspline import regularize_bsplines

    arts = sorted(C.TUBE_ARTICULATORS)
    model = ArtSpeech(vocab_size=64, n_articulators=11)
    tokens = jnp.asarray(rng.integers(0, 64, (16, 128)), jnp.int32)
    lengths = jnp.full((16,), 128, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, lengths)["params"]

    @jax.jit
    def synthesize(params, tokens, lengths):
        contours = model.apply({"params": params}, tokens, lengths)
        smooth = jnp.swapaxes(regularize_bsplines(jnp.swapaxes(contours, -1, -2)), -1, -2)
        flat = smooth.reshape(-1, 11, 2, 50)
        internal, external = generate_vocal_tract_tube_batch(flat, arts)
        area = jax.vmap(lambda i, e: tube_area_function(i, e))(internal, external)
        return area

    ms = timeit(synthesize, params, tokens, lengths)
    add("synthesis_e2e", ms, f"2048 frames, {2048 / ms * 1e3:,.0f} frames/s")

    # --- native contour loader ---
    import tempfile

    from artspeech_tpu.data import native
    from artspeech_tpu.data.loaders import cached_load_articulator_array, clear_contour_cache

    tmp = tempfile.mkdtemp()
    paths = []
    for i in range(2000):
        p = os.path.join(tmp, f"{i}.npy")
        np.save(p, rng.uniform(0, 136, (50, 2)).astype(np.float32))
        paths.append(p)
    t0 = time.perf_counter()
    for p in paths:
        cached_load_articulator_array(p, 136.0)
    py_ms = (time.perf_counter() - t0) * 1e3
    clear_contour_cache()
    add("contour_load_python", py_ms, "2000 files, cold")
    if native.available():
        t0 = time.perf_counter()
        native.load_contour_batch(paths, 136.0, 50)
        add("contour_load_native", (time.perf_counter() - t0) * 1e3, "2000 files, cold")

    out_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(out_dir, "bench_details.json"), "w") as f:
        json.dump({"device": device, "results": rows}, f, indent=2)
    with open(os.path.join(out_dir, "BENCH_DETAILS.md"), "w") as f:
        f.write(f"# Benchmark details\n\nDevice: {device}\n\n")
        f.write("| benchmark | median ms | detail |\n|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['benchmark']} | {r['median_ms']} | {r['detail']} |\n")
    print("wrote BENCH_DETAILS.md")


if __name__ == "__main__":
    main()
