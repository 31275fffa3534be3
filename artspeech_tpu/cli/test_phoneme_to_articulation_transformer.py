"""Evaluate a trained transformer autoregressively on a held-out split.

Equivalent of reference test_phoneme_to_articulation_transformer.py:29-129.

Usage: python -m artspeech_tpu.cli.test_phoneme_to_articulation_transformer \
           --config cfg.yaml
"""

import json
import os

import jax
import jax.numpy as jnp

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.datasets import ArtSpeechDataset
from artspeech_tpu.eval.articulation import run_test
from artspeech_tpu.models.transformer import (
    ArtSpeechTransformer,
    make_auto_generate,
)
from artspeech_tpu.train.checkpoint import load_params
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    articulators = sorted(cfg["articulators"])
    n_samples = cfg.get("n_samples", 50)

    model = ArtSpeechTransformer(
        vocab_size=len(vocabulary),
        num_articulators=len(articulators),
        num_feat=2 * n_samples,
        **(cfg.get("model_kwargs") or {}),
    )
    b, t = 1, 8
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, t), jnp.int32),
        jnp.zeros((b, t, len(articulators), 2 * n_samples)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )["params"]
    params = load_params(cfg["state_dict_filepath"], template)

    dataset = ArtSpeechDataset(
        cfg["datadir"],
        database_name,
        sequences_from_dict(cfg["datadir"], cfg["test_seq_dict"]),
        vocabulary,
        articulators,
        clip_tails=cfg.get("clip_tails", True),
    )
    # Autoregressive decode is inference-only and latency-bound at small
    # batch (~90 sub-MXU matmuls per step — benchmarks/NOTES.md "Fused
    # Mosaic decode time-loop"), so offline evaluation batches sentences at
    # the serving width where the per-step fixed cost amortizes AND the
    # caches reach the flash decode-attention kernel's HBM-streaming
    # dispatch regime (>=32MB/cache, ops/pallas_attention.py): measured
    # 3.8k -> 15k frames/s from B=4 to B=64 at T=128 f32. Dummy pad rows
    # have length 0 and are excluded from metrics/outputs by run_test;
    # ``generate_batch_size`` overrides (set it to batch_size to reproduce
    # the reference's exact batching).
    gen_bs = cfg.get("generate_batch_size")
    if gen_bs is None:
        # Serving default applies on the accelerator only: on host backends
        # (the CPU test mesh) padding every batch to 64 mostly-dummy rows
        # just multiplies eval compute.
        gen_bs = (
            max(cfg["batch_size"], 64)
            if jax.default_backend() == "tpu"
            else cfg["batch_size"]
        )
    loader = BucketedLoader(dataset, batch_size=gen_bs, shuffle=False)

    # Per-bucket dispatch between the KV-cached scan and the buffer
    # re-decode by the measured crossover band (benchmarks/BENCH_DETAILS.md
    # "Generate crossover"): never slower at any bucket length.
    # generate_cache_dtype defaults to bfloat16 KV caches (round 5): the
    # bf16-cache decode wins at EVERY length (T=128 b64: 571 -> 338ms) and
    # the rounding cost was measured in P2CP-mm on a synthetic-corpus-
    # trained model — trajectory delta 0.15mm, quality-vs-target delta
    # 0.0014mm (benchmarks/NOTES.md "Serving cache dtype"); set
    # generate_cache_dtype: float32 for bit-level reference parity.
    cache_dtype = cfg.get("generate_cache_dtype", "bfloat16")
    if str(cache_dtype).lower() in ("float32", "fp32", "none"):
        cache_dtype = None
    apply_fn = make_auto_generate(model, cache_dtype=cache_dtype)

    info = run_test(
        params,
        apply_fn,
        loader,
        articulators,
        to_mm=mm_per_unit(DATASET_CONFIG[database_name]),
        outputs_dir=cfg.get(
            "save_to", os.path.join(args.output_dir, "test_outputs", "0")
        ),
        regularize_out=cfg.get("regularize_out", False),
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Test phoneme-to-articulation transformer", main)
