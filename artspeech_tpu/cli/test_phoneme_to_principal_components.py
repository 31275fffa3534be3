"""Evaluate a trained latent-RNN (phonemes -> principal components) model.

Equivalent of reference test_phoneme_to_principal_components.py:28-164.

Usage: python -m artspeech_tpu.cli.test_phoneme_to_principal_components \
           --config cfg.yaml
"""

import json
import os

import jax
import jax.numpy as jnp

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.cli.train_phoneme_to_principal_components import build_frozen_ae
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.pc_datasets import (
    PrincipalComponentsDataset,
    load_norm_stats,
    stack_norm_stats,
)
from artspeech_tpu.eval.autoencoder import run_latent_rnn_test
from artspeech_tpu.models.autoencoder import normalize_indices_dict
from artspeech_tpu.models.latent_rnn import PrincipalComponentsArtSpeech
from artspeech_tpu.train.checkpoint import load_params
from artspeech_tpu.train.state import TrainState
from artspeech_tpu.utils.io import sequences_from_dict

import optax


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    to_mm = mm_per_unit(DATASET_CONFIG[database_name])
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    indices_dict = normalize_indices_dict(cfg["indices_dict"])
    articulators = sorted(indices_dict.keys())
    datadir = cfg["datadir"]

    norm_stats = load_norm_stats(datadir, articulators)
    denorm_mean, denorm_std = stack_norm_stats(norm_stats, articulators)
    _, decode_fn = build_frozen_ae(cfg, indices_dict, articulators, require_encoder=False)

    model = PrincipalComponentsArtSpeech(
        vocab_size=len(vocabulary),
        indices_dict=indices_dict,
        **(cfg.get("model_kwargs") or {}),
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32),
    )["params"]
    params = load_params(cfg["state_dict_filepath"], template)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())

    dataset = PrincipalComponentsDataset(
        datadir,
        database_name,
        sequences_from_dict(datadir, cfg["test_seq_dict"]),
        vocabulary,
        articulators,
        TV_to_phoneme_map=cfg.get("TV_to_phoneme_map"),
        clip_tails=cfg.get("clip_tails", True),
        norm_stats=norm_stats,
    )
    loader = BucketedLoader(dataset, batch_size=cfg.get("batch_size", 8), shuffle=False)

    def apply_fn(params, tokens, lengths):
        return model.apply({"params": params}, tokens, lengths)

    info = run_latent_rnn_test(
        state,
        apply_fn,
        decode_fn,
        loader,
        articulators,
        denorm_mean,
        denorm_std,
        to_mm,
        rescale_factor=cfg.get("rescale_factor", 1.0),
        outputs_dir=cfg.get(
            "save_to", os.path.join(args.output_dir, "test_outputs", "0")
        ),
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps({"p2cp_mm": info["p2cp_mm"]}, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Test phoneme-to-principal-components", main)
