"""Train the model-free BiGRU phoneme-to-articulation model.

Equivalent of reference train_phoneme_to_articulation.py (main thesis
trainer): Adam + plateau LR + early stopping on valid P2CP-mm, then a final
test pass with artifact dumps. YAML config keys mirror the reference
``main(**cfg)`` surface (datadir, database_name, num_epochs, batch_size,
patience, learning_rate, weight_decay, train/valid/test_seq_dict,
vocab_filepath, articulators, model_kwargs, clip_tails, seed).

Usage: python -m artspeech_tpu.cli.train_phoneme_to_articulation \
           --config config.yaml [--output_dir results]
"""

import json
import os

import jax

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.datasets import ArtSpeechDataset
from artspeech_tpu.eval.articulation import run_test
from artspeech_tpu.models.artspeech_rnn import ArtSpeech
from artspeech_tpu.train.checkpoint import restore_checkpoint
from artspeech_tpu.train.loop import fit
from artspeech_tpu.train.state import count_parameters, create_train_state
from artspeech_tpu.train.step import (
    make_artspeech_eval_step,
    make_artspeech_train_step,
)
from artspeech_tpu.utils.io import sequences_from_dict

import jax.numpy as jnp
import numpy as np


def main(cfg, args, tracker):
    datadir = cfg["datadir"]
    database_name = cfg["database_name"]
    dataset_config = DATASET_CONFIG[database_name]
    to_mm = mm_per_unit(dataset_config)
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    articulators = sorted(cfg["articulators"])
    clip_tails = cfg.get("clip_tails", True)
    seed = cfg.get("seed", 0)

    from artspeech_tpu.cli.common import model_kwargs_from_cfg

    model_kwargs = model_kwargs_from_cfg(cfg)
    model = ArtSpeech(
        vocab_size=len(vocabulary),
        n_articulators=len(articulators),
        **model_kwargs,
    )

    # Data-parallel by default: collated batches pad to a multiple of the
    # local device count so fit()'s dp mesh uses every chip (1 on a single
    # chip; the dummy rows have length 0 and are excluded by every mask).
    n_devices = len(jax.devices())
    loaders = {}
    for split, seq_key, shuffle in (
        ("train", "train_seq_dict", True),
        ("valid", "valid_seq_dict", False),
        ("test", "test_seq_dict", False),
    ):
        dataset = ArtSpeechDataset(
            datadir,
            database_name,
            sequences_from_dict(datadir, cfg[seq_key]),
            vocabulary,
            articulators,
            clip_tails=clip_tails,
        )
        loaders[split] = BucketedLoader(
            dataset,
            batch_size=cfg["batch_size"],
            shuffle=shuffle,
            seed=seed,
            pad_to_multiple=n_devices,
        )

    rng = jax.random.PRNGKey(seed)
    sample_tokens = jnp.zeros((cfg["batch_size"], 32), jnp.int32)
    sample_lengths = jnp.full((cfg["batch_size"],), 32, jnp.int32)
    state = create_train_state(
        model,
        rng,
        (sample_tokens, sample_lengths),
        learning_rate=cfg["learning_rate"],
        weight_decay=cfg.get("weight_decay", 0.0),
    )
    if cfg.get("state_dict_filepath"):
        state, _ = restore_checkpoint(cfg["state_dict_filepath"], state)

    n_params = count_parameters(state.params)
    tracker.log_params({"num_network_params": n_params})
    print(f"ArtSpeech -- {n_params} parameters")

    # The step is built against the resolved dp mesh: at the Pallas
    # recurrence kernels' dispatch floor (per-shard B>=64, lane-aligned
    # hidden — train/step.py prefer_manual_spmd) fit() gets the manual-SPMD
    # shard_map variant, the only multi-device path under which those
    # kernels dispatch; below it the default auto-GSPMD step is identical.
    from artspeech_tpu.train.step import prefer_manual_spmd

    def build_train_step(mesh):
        use_mesh = (
            mesh
            if prefer_manual_spmd(
                mesh,
                loaders["train"].collate_batch_size,
                model_kwargs.get("hidden_size", 128),
            )
            else None
        )
        return make_artspeech_train_step(to_mm=to_mm, mesh=use_mesh)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    result = fit(
        state,
        loaders["train"],
        loaders["valid"],
        None,
        make_artspeech_eval_step(to_mm=to_mm),
        train_step_factory=build_train_step,
        n_epochs=cfg["num_epochs"],
        checkpoints_dir=ckpt_dir,
        monitor="p2cp_mm",
        patience=cfg.get("patience", 30),
        tracker=tracker,
        seed=seed,
        resume=args.checkpoint_filepath is not None,
        resume_from=args.checkpoint_filepath,
    )
    print(f"Best valid p2cp_mm: {result.best_metric:.4f} @ <= epoch {result.last_epoch}")

    # Final test with the best model (reference :331-371).
    best_state, _ = restore_checkpoint(result.best_params_dir, result.state)
    outputs_dir = os.path.join(args.output_dir, "test_outputs", "0")

    def apply_fn(params, tokens, lengths):
        return model.apply({"params": params}, tokens, lengths)

    info = run_test(
        best_state.params,
        apply_fn,
        loaders["test"],
        articulators,
        to_mm=to_mm,
        outputs_dir=outputs_dir,
        regularize_out=cfg.get("regularize_out", False),
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps({"loss": info["loss"]}, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Train phoneme-to-articulation (BiGRU)", main)
