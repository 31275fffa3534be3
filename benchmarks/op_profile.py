"""Per-XLA-op device-time profile of a named workload.

Answers "where do the milliseconds of a jitted step actually go" from a
jax.profiler trace: aggregates the device-side HLO-op events (the 'XLA Ops'
rows of the trace, not the whole-module 'jit_*' spans) over a burst of
dependency-chained steps and reports per-op-category totals plus the top
individual ops, normalized per step.

This is the committed version of the throwaway analysis that produced the
"recognizer step budget" section of BENCH_DETAILS.md (round 2/3): layout
copies, RNG cost and scan overheads are invisible in end-to-end timings but
obvious here.

Run (real TPU):
    cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site \
        python /root/repo/benchmarks/op_profile.py <workload>

Workloads: bigru_b256 | bigru_b12 | recognizer_b8 | transformer_b12 |
transformer_b64 |
synthesis | synthesis_grid. Add ``--bf16`` for the bf16 model variants.
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

STEPS = 8


# ---------------------------------------------------------------------------
# Workload builders: return (step, carry0, fetch) with chained dependencies,
# mirroring run_all.py's benchmark definitions.
# ---------------------------------------------------------------------------


def build_bigru(batch_size, dtype):
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.train.state import create_train_state
    from artspeech_tpu.train.step import make_artspeech_train_step

    rng = np.random.default_rng(0)
    nart, t = 10, 128
    model = ArtSpeech(vocab_size=64, n_articulators=nart, dropout=0.1, dtype=dtype)
    tokens = jnp.asarray(rng.integers(0, 64, (batch_size, t)), jnp.int32)
    lengths = jnp.full((batch_size,), t, jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-4)
    step = make_artspeech_train_step(to_mm=220.0, donate=False)
    batch = {
        "tokens": tokens,
        "targets": jnp.asarray(
            rng.uniform(size=(batch_size, t, nart, 2, 50)).astype(np.float32)
        ),
        "lengths": lengths,
    }

    def chain(carry):
        st, _ = carry
        st2, m = step(st, batch, jax.random.PRNGKey(0))
        return st2, m["loss"]

    return chain, (state, jnp.zeros(())), lambda c: float(c[1])


def build_recognizer(dtype):
    import jax
    import jax.numpy as jnp
    import optax

    from artspeech_tpu.models.deepspeech2 import DeepSpeech2
    from artspeech_tpu.train.recognition_step import make_recognition_train_step
    from artspeech_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    b, audio_len, hop = 8, 81920, 256
    t = audio_len // hop + 1
    batch = {
        "audio": jnp.asarray(rng.normal(size=(b, audio_len)).astype(np.float32)),
        "input_lengths": jnp.full((b,), t, jnp.int32),
        "ctc_target": jnp.asarray(rng.integers(1, 31, (b, 40)), jnp.int32),
        "ctc_target_lengths": jnp.full((b,), 40, jnp.int32),
    }
    feats = jnp.zeros((b, 2, 80, t), jnp.float32)
    ds2 = DeepSpeech2(num_classes=31, dtype=dtype)
    params = ds2.init(jax.random.PRNGKey(0), feats, lengths=batch["input_lengths"])[
        "params"
    ]
    state = TrainState.create(apply_fn=ds2.apply, params=params, tx=optax.adam(1e-4))
    step = make_recognition_train_step(ds2, "ctc", "ctc_target", feature="melspec",
                                       donate=False)

    def chain(carry):
        st, _ = carry
        st2, m = step(st, batch, jax.random.PRNGKey(0))
        return st2, m["loss"]

    return chain, (state, jnp.zeros(())), lambda c: float(c[1])


def build_transformer(dtype, b=12):
    import jax
    import jax.numpy as jnp
    import optax

    from artspeech_tpu.models.transformer import ArtSpeechTransformer
    from artspeech_tpu.train.state import TrainState
    from artspeech_tpu.train.step import make_transformer_train_step

    rng = np.random.default_rng(0)
    t, c = 128, 10
    src = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    tgt = jnp.asarray(rng.uniform(size=(b, t, c, 100)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)
    tr = ArtSpeechTransformer(vocab_size=64, num_articulators=c, dropout=0.1,
                              dtype=dtype)
    params = tr.init(jax.random.PRNGKey(0), src, tgt, lengths, lengths)["params"]
    state = TrainState.create(apply_fn=tr.apply, params=params, tx=optax.adam(1e-4))
    step = make_transformer_train_step(to_mm=220.0, donate=False)
    batch = {
        "tokens": src,
        "targets": jnp.asarray(
            rng.uniform(size=(b, t, c, 2, 50)).astype(np.float32)
        ),
        "lengths": lengths,
    }

    def chain(carry):
        st, _ = carry
        st2, m = step(st, batch, jax.random.PRNGKey(0))
        return st2, m["loss"]

    return chain, (state, jnp.zeros(())), lambda c: float(c[1])


def build_transformer_accum(dtype, b=64):
    """The serving-batch ACCUM train step — what the train CLI actually
    builds at B>=32 on one chip (train/step.py transformer_accum_steps):
    a scan of B/mb microbatches with exact-loss bookkeeping. This is the
    row whose optimum (84.4ms f32 mb=2 / 59.6ms bf16 mb=4) VERDICT r4
    weak #3 asks to decompose and attack."""
    import jax
    import jax.numpy as jnp
    import optax

    from artspeech_tpu.models.transformer import ArtSpeechTransformer
    from artspeech_tpu.train.state import TrainState
    from artspeech_tpu.train.step import (
        make_transformer_train_step,
        transformer_accum_steps,
    )

    rng = np.random.default_rng(0)
    t, c = 128, 10
    src = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    tgt = jnp.asarray(rng.uniform(size=(b, t, c, 100)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)
    tr = ArtSpeechTransformer(vocab_size=64, num_articulators=c, dropout=0.1,
                              dtype=dtype)
    params = tr.init(jax.random.PRNGKey(0), src, tgt, lengths, lengths)["params"]
    state = TrainState.create(apply_fn=tr.apply, params=params, tx=optax.adam(1e-4))
    k = transformer_accum_steps(b, dtype=dtype)
    step = make_transformer_train_step(to_mm=220.0, donate=False, accum_steps=k)
    print(f"accum workload: B={b} accum_steps={k} (microbatch {b // k})")
    batch = {
        "tokens": src,
        "targets": jnp.asarray(
            rng.uniform(size=(b, t, c, 2, 50)).astype(np.float32)
        ),
        "lengths": lengths,
    }

    def chain(carry):
        st, _ = carry
        st2, m = step(st, batch, jax.random.PRNGKey(0))
        return st2, m["loss"]

    return chain, (state, jnp.zeros(())), lambda c: float(c[1])


def build_transformer_decode(dtype, b=4, cache_dtype=None):
    """The KV-cached autoregressive decode at the T=128 bucket: the slowest
    per-sample inference surface — at B=4 per-step cost is dominated by the
    while-body's per-op fixed cost; the B=64 serving batch shows where the
    cost moves once the tiny ops have real extents (see NOTES.md).
    ``cache_dtype`` profiles the serving bf16-cache profile (f32 model)."""
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.transformer import (
        ArtSpeechTransformer,
        make_fast_generate,
    )

    rng = np.random.default_rng(0)
    t, c = 128, 10
    src = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)
    tgt0 = jnp.asarray(rng.uniform(size=(b, t, c, 100)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)
    tr = ArtSpeechTransformer(vocab_size=64, num_articulators=c, dtype=dtype)
    params = tr.init(jax.random.PRNGKey(0), src, tgt0, lengths, lengths)["params"]
    gen = jax.jit(make_fast_generate(tr, max_len=t, cache_dtype=cache_dtype))

    def chain(carry):
        src_dep, _ = carry
        out = gen(params, src_dep, lengths)
        return src_dep + 0 * jnp.sum(out).astype(src_dep.dtype), jnp.sum(out)

    return chain, (src, jnp.zeros(())), lambda c: float(c[1])


def build_synthesis(grid):
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.core import constants as C
    from artspeech_tpu.geometry import (
        default_semipolar_grid,
        generate_vocal_tract_tube_batch,
        tube_area_function,
    )
    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.ops.bspline import regularize_bsplines

    rng = np.random.default_rng(0)
    arts = sorted(C.TUBE_ARTICULATORS)
    model = ArtSpeech(vocab_size=64, n_articulators=11)
    tokens = jnp.asarray(rng.integers(0, 64, (16, 128)), jnp.int32)
    lengths = jnp.full((16,), 128, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, lengths)["params"]
    grid_j = jnp.asarray(default_semipolar_grid()) if grid else None

    @jax.jit
    def synthesize(params, tokens, lengths):
        contours = model.apply({"params": params}, tokens, lengths)
        smooth = jnp.swapaxes(
            regularize_bsplines(jnp.swapaxes(contours, -1, -2)), -1, -2
        )
        flat = smooth.reshape(-1, 11, 2, 50)
        if grid:
            internal, external = generate_vocal_tract_tube_batch(
                flat, arts, wall_points=100
            )
            area = jax.vmap(
                lambda i, e: tube_area_function(
                    i, e, semipolar_grid=grid_j, n_samples=200
                )
            )(internal, external)
        else:
            internal, external = generate_vocal_tract_tube_batch(flat, arts)
            area = jax.vmap(lambda i, e: tube_area_function(i, e))(internal, external)
        return area

    def chain(carry):
        toks, _ = carry
        area = synthesize(params, toks, lengths)
        anchor = area.ravel()[0]
        toks = toks + (anchor * 0).astype(toks.dtype)
        return toks, anchor

    return chain, (tokens, jnp.zeros(())), lambda c: float(c[1])


WORKLOADS = {
    "bigru_b256": lambda dt: build_bigru(256, dt),
    "bigru_b12": lambda dt: build_bigru(12, dt),
    "recognizer_b8": lambda dt: build_recognizer(dt),
    "transformer_b12": lambda dt: build_transformer(dt),
    "transformer_b64": lambda dt: build_transformer(dt, b=64),
    "transformer_b64_accum": lambda dt: build_transformer_accum(dt, b=64),
    "transformer_decode": lambda dt: build_transformer_decode(dt),
    "transformer_decode_b64": lambda dt: build_transformer_decode(dt, b=64),
    "transformer_decode_b64_cache16": lambda dt: build_transformer_decode(
        dt, b=64, cache_dtype="bfloat16"
    ),
    "synthesis": lambda dt: build_synthesis(False),
    "synthesis_grid": lambda dt: build_synthesis(True),
}


# ---------------------------------------------------------------------------
# Trace analysis
# ---------------------------------------------------------------------------

_CATEGORY_RULES = (
    ("copy", "copy"),
    ("fusion", "fusion"),
    ("convolution", "convolution"),
    ("dot", "dot"),
    ("while", "while(scan)"),
    ("dynamic-update-slice", "dyn-update-slice"),
    ("dynamic_update_slice", "dyn-update-slice"),
    ("dynamic-slice", "dyn-slice"),
    ("rng", "rng"),
    ("reduce", "reduce"),
    ("scatter", "scatter"),
    ("gather", "gather"),
    ("transpose", "transpose"),
    ("broadcast", "broadcast"),
    ("iota", "iota"),
    ("select", "select"),
    ("convert", "convert"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("reduce-scatter", "collective"),
    ("custom-call", "custom-call"),
)


def categorize(name: str) -> str:
    base = name.lstrip("%")
    for prefix, cat in _CATEGORY_RULES:
        if base.startswith(prefix):
            return cat
    return re.sub(r"[.\d_]+$", "", base) or base


def profile(step, carry0, fetch, steps=STEPS):
    """Trace ``steps`` chained iterations; return (op_events, module_ms)."""
    import jax

    carry = step(carry0)
    fetch(carry)  # compile + warm outside the trace
    tmp = tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(tmp):
        c = carry
        for _ in range(steps):
            c = step(c)
        fetch(c)

    traces = glob.glob(os.path.join(tmp, "plugins", "profile", "*", "*.trace.json.gz"))
    if not traces:
        raise SystemExit("no trace produced (CPU backend?)")
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
    # Threads on a device pid: 'XLA Modules' (whole-program spans), 'XLA Ops'
    # (per-HLO-op spans), plus container/step lines whose events would
    # double-count — keep exactly the two we can attribute.
    thread_names = {
        (e["pid"], e.get("tid")): str(e.get("args", {}).get("name", ""))
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    ops, modules = [], {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids or "dur" not in e:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        if "Module" in tname:
            modules.setdefault(str(e.get("name", "")), []).append(e["dur"])
        elif "Ops" in tname:
            ops.append(e)
    return ops, modules


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    if len(args) != 1 or args[0] not in WORKLOADS:
        raise SystemExit(f"usage: op_profile.py <{'|'.join(WORKLOADS)}> [--bf16]")
    name = args[0]

    try:
        from artspeech_tpu.cli.common import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    step, carry0, fetch = WORKLOADS[name]("bfloat16" if bf16 else None)
    ops, modules = profile(step, carry0, fetch)

    mod_name, durs = max(modules.items(), key=lambda kv: sum(kv[1]))
    durs.sort()
    # The dominant module span per step; op totals normalize by ITS count so
    # warmup/other modules in the trace don't skew the per-step numbers.
    n_exec = len(durs)
    module_ms = durs[len(durs) // 2] / 1e3

    by_cat, by_op = {}, {}
    for e in ops:
        cat = categorize(str(e["name"]))
        by_cat[cat] = by_cat.get(cat, 0.0) + e["dur"]
        key = str(e["name"])
        rec = by_op.setdefault(key, [0.0, 0])
        rec[0] += e["dur"]
        rec[1] += 1

    print(f"workload: {name}{' bf16' if bf16 else ''}")
    print(f"module: {mod_name}  median span {module_ms:.3f}ms  ({n_exec} executions)")
    print(f"\nper-step device time by op category (ms, over {n_exec} executions):")
    total = 0.0
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        ms = us / 1e3 / n_exec
        total += ms
        if ms >= 0.005:
            print(f"  {cat:24s} {ms:8.3f}")
    print(f"  {'TOTAL':24s} {total:8.3f}")
    print("\ntop 15 individual ops (per-step ms, count/step):")
    for op, (us, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"  {op:44s} {us / 1e3 / n_exec:8.3f}  x{cnt / n_exec:.1f}")

    # --cat=<category>: top ops of one category (e.g. --cat=copy to chase
    # layout copies, as in the round-3 recognizer fix).
    cat_arg = next((a.split("=", 1)[1] for a in sys.argv[1:]
                    if a.startswith("--cat=")), None)
    if cat_arg:
        print(f"\ntop ops in category '{cat_arg}':")
        rows = [(op, v) for op, v in by_op.items()
                if categorize(op) == cat_arg]
        for op, (us, cnt) in sorted(rows, key=lambda kv: -kv[1][0])[:15]:
            print(f"  {op:44s} {us / 1e3 / n_exec:8.3f}  x{cnt / n_exec:.1f}")


if __name__ == "__main__":
    main()
