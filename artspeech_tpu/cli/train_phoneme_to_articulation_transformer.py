"""Train the multi-channel transformer phoneme-to-articulation model.

Equivalent of reference train_phoneme_to_articulation_transformer.py:49-454:
teacher forcing with right-shifted targets, Adam + plateau, early stopping on
valid P2CP-mm, final AUTOREGRESSIVE test with artifact dumps (reference
transformer/evaluation.py:19-191).

Usage: python -m artspeech_tpu.cli.train_phoneme_to_articulation_transformer \
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
from artspeech_tpu.train.checkpoint import restore_checkpoint
from artspeech_tpu.train.loop import fit
from artspeech_tpu.train.state import count_parameters, create_train_state
from artspeech_tpu.train.step import (
    make_transformer_eval_step,
    make_transformer_train_step,
    shift_targets_right,
)
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    to_mm = mm_per_unit(DATASET_CONFIG[database_name])
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    articulators = sorted(cfg["articulators"])
    seed = cfg.get("seed", 0)
    n_samples = cfg.get("n_samples", 50)

    from artspeech_tpu.cli.common import model_kwargs_from_cfg

    model = ArtSpeechTransformer(
        vocab_size=len(vocabulary),
        num_articulators=len(articulators),
        num_feat=2 * n_samples,
        **model_kwargs_from_cfg(cfg),
    )

    loaders = {}
    for split, key, shuffle in (
        ("train", "train_seq_dict", True),
        ("valid", "valid_seq_dict", False),
        ("test", "test_seq_dict", False),
    ):
        dataset = ArtSpeechDataset(
            cfg["datadir"],
            database_name,
            sequences_from_dict(cfg["datadir"], cfg[key]),
            vocabulary,
            articulators,
            clip_tails=cfg.get("clip_tails", True),
        )
        loaders[split] = BucketedLoader(
            dataset,
            batch_size=cfg["batch_size"],
            shuffle=shuffle,
            seed=seed,
            # dp-shardable batch dim; fit() builds the mesh (see train/loop.py)
            pad_to_multiple=len(jax.devices()),
        )

    b, t = cfg["batch_size"], 32
    sample_tokens = jnp.zeros((b, t), jnp.int32)
    sample_tgt = jnp.zeros((b, t, len(articulators), 2 * n_samples))
    sample_lengths = jnp.full((b,), t, jnp.int32)
    state = create_train_state(
        model,
        jax.random.PRNGKey(seed),
        (sample_tokens, sample_tgt, sample_lengths, sample_lengths),
        learning_rate=cfg["learning_rate"],
        weight_decay=cfg.get("weight_decay", 0.0),
    )
    tracker.log_params({"num_network_params": count_parameters(state.params)})
    print(f"ArtSpeechTransformer -- {count_parameters(state.params)} parameters")

    # Serving-batch training scans ~8-sentence microbatches on one chip
    # (grad accumulation inside the jitted step): the plain step's per-frame
    # throughput degrades past B~16 as the live cross-channel activations
    # outgrow HBM (measured B=64 f32 44.8k -> 83.2k frames/s with k=8 —
    # train/step.py transformer_accum_steps). Under dp the per-device shard
    # is already small, so the policy keeps accumulation off there.
    # ``accum_steps`` in the config overrides (1 = reference-exact batching).
    from artspeech_tpu.train.step import transformer_accum_steps

    def build_train_step(mesh):
        accum = cfg.get(
            "accum_steps",
            transformer_accum_steps(
                loaders["train"].collate_batch_size,
                mesh.size if mesh is not None else 1,
                dtype=model.dtype,
            ),
        )
        print(f"transformer train step: accum_steps={accum} "
              f"(collate batch {loaders['train'].collate_batch_size}, "
              f"dtype={model.dtype})")
        return make_transformer_train_step(to_mm=to_mm, accum_steps=accum)

    result = fit(
        state,
        loaders["train"],
        loaders["valid"],
        None,
        make_transformer_eval_step(to_mm=to_mm),
        train_step_factory=build_train_step,
        n_epochs=cfg["num_epochs"],
        checkpoints_dir=os.path.join(args.output_dir, "checkpoints"),
        monitor="p2cp_mm",
        patience=cfg.get("patience", 30),
        tracker=tracker,
        seed=seed,
        resume=args.checkpoint_filepath is not None,
        resume_from=args.checkpoint_filepath,
    )

    best_state, _ = restore_checkpoint(result.best_params_dir, result.state)

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
        best_state.params,
        apply_fn,
        loaders["test"],
        articulators,
        to_mm=to_mm,
        outputs_dir=os.path.join(args.output_dir, "test_outputs", "0"),
        regularize_out=cfg.get("regularize_out", False),
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps({"loss": info["loss"]}, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Train phoneme-to-articulation transformer", main)
