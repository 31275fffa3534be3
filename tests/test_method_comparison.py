"""The thesis headline comparison, end to end through the REAL CLIs:

train mean_contour / encoder_decoder / autoencoder-based -> generate a
synthetic corpus per method -> train the phoneme recognizer -> score each
synthetic corpus with test_phoneme_recognition (synthetic: true) -> a
method-comparison PER table. This is the canonical workflow of reference
thesis_config/phoneme_recognition/test_synthetic_*.yaml (VERDICT r1 #3).

Everything runs tiny (3 sentences, 8 frames, small hidden dims) on the
8-device CPU mesh; the point is the full config->CLI->artifact chain, not
metric quality.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR
from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus

ARTS = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)
INDICES = {a: 2 for a in ARTS}
NUM_FEATURES = len(ARTS) * 50  # vocal_tract feature rows (2, Nart*50, T)


def _run_cli(module_name, cfg, output_dir, monkeypatch, tmp_path):
    import importlib

    cfg_path = tmp_path / f"{module_name}_{len(os.listdir(tmp_path))}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    module = importlib.import_module(f"artspeech_tpu.cli.{module_name}")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            module_name,
            "--config",
            str(cfg_path),
            "--output_dir",
            str(output_dir),
            "--run_name",
            "run",
        ],
    )
    from artspeech_tpu.cli.common import run_experiment

    return run_experiment(module_name, module.main)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmp_corpus"))
    info = make_synthetic_corpus(
        root,
        subjects=("s1",),
        sequences=("S01", "S02", "S03"),
        n_sentences=3,
        frames_per_sentence=8,
    )
    vocab_path = os.path.join(root, "vocabulary.json")
    with open(vocab_path, "w") as f:
        json.dump(info["phonemes"], f)
    return root, vocab_path


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cmp_work")


def _base_cfg(root, vocab_path):
    return {
        "database_name": "gottingen",
        "datadir": root,
        "vocab_filepath": vocab_path,
        "clip_tails": False,
        "articulators": ARTS,
    }


def test_method_comparison_per_table(corpus, workdir, tmp_path, monkeypatch):
    root, vocab_path = corpus
    seqs = {
        "train_seq_dict": {"s1": ["S01"]},
        "valid_seq_dict": {"s1": ["S02"]},
        "test_seq_dict": {"s1": ["S03"]},
    }

    # --- 1. train the three phoneme-to-articulation methods -------------
    mc_dir = workdir / "mean_contour"
    cfg = {**_base_cfg(root, vocab_path), "batch_size": 4,
           "train_seq_dict": seqs["train_seq_dict"],
           "test_seq_dict": seqs["test_seq_dict"]}
    _run_cli("train_phoneme_wise_mean_contour", cfg, mc_dir, monkeypatch, tmp_path)
    mc_table = str(mc_dir / "mean_contour_table.npz")
    assert os.path.isfile(mc_table)

    ed_dir = workdir / "encoder_decoder"
    cfg = {**_base_cfg(root, vocab_path), **seqs, "batch_size": 4,
           "num_epochs": 2, "patience": 5, "learning_rate": 1e-3,
           "model_kwargs": {"hidden_size": 16}}
    _run_cli("train_phoneme_to_articulation", cfg, ed_dir, monkeypatch, tmp_path)
    ed_ckpt = str(ed_dir / "checkpoints" / "best_model")

    ae_dir = workdir / "autoencoder"
    cfg = {**_base_cfg(root, vocab_path), **seqs, "batch_size": 16,
           "num_epochs": 2, "patience": 5, "learning_rate": 1e-3,
           "indices_dict": INDICES, "hidden_features": 8}
    del cfg["articulators"]
    _run_cli("train_principal_components_autoencoder", cfg, ae_dir, monkeypatch, tmp_path)
    enc_ckpt = str(ae_dir / "checkpoints" / "best_encoder")
    dec_ckpt = str(ae_dir / "checkpoints" / "best_decoder")

    ab_dir = workdir / "autoencoder_based"
    cfg = {**_base_cfg(root, vocab_path), **seqs, "batch_size": 4,
           "num_epochs": 2, "patience": 5, "learning_rate": 1e-3,
           "indices_dict": INDICES, "hidden_features": 8,
           "beta1": 0.5, "beta2": 3.0, "beta3": 0.0,
           "encoder_state_dict_filepath": enc_ckpt,
           "decoder_state_dict_filepath": dec_ckpt,
           "model_kwargs": {"hidden_size": 16}}
    del cfg["articulators"]
    _run_cli("train_phoneme_to_principal_components", cfg, ab_dir, monkeypatch, tmp_path)
    ab_ckpt = str(ab_dir / "checkpoints" / "best_model")

    # --- 2. generate a synthetic corpus per method ----------------------
    method_cfgs = {
        "mean_contour": {"state_dict_filepath": mc_table},
        "encoder_decoder": {"state_dict_filepath": ed_ckpt,
                            "model_params": {"hidden_size": 16}},
        "autoencoder": {"state_dict_filepath": ab_ckpt,
                        "indices_dict": INDICES,
                        "decoder_state_dict_filepath": dec_ckpt,
                        "model_params": {"hidden_size": 16},
                        "aux_model_params": {"hidden_features": 8}},
    }
    synth_dirs = {}
    for method, extra in method_cfgs.items():
        out = workdir / f"gen_{method}"
        synth_dirs[method] = str(out / "synthesis")
        cfg = {**_base_cfg(root, vocab_path), "method": method,
               "seq_dict": seqs["test_seq_dict"], "batch_size": 4,
               "save_to": synth_dirs[method], **extra}
        _run_cli("generate_vocal_tract_shape", cfg, out, monkeypatch, tmp_path)
        assert os.path.isdir(synth_dirs[method])

    # --- 3. train the recognizer on the real corpus ---------------------
    rec_dir = workdir / "recognizer"
    rec_model = {"in_channels": 2, "num_residual_layers": 1,
                 "num_rnn_layers": 1, "rnn_hidden_size": 16,
                 "num_features": NUM_FEATURES, "adapter_out_features": 16,
                 "dropout": 0.1}
    cfg = {**_base_cfg(root, vocab_path), **seqs, "batch_size": 4,
           "num_epochs": 2, "patience": 5, "learning_rate": 1e-3,
           "feature": "vocal_tract", "target": "ctc", "loss": "ctc",
           "model_params": rec_model}
    del cfg["articulators"]
    _run_cli("train_phoneme_recognition", cfg, rec_dir, monkeypatch, tmp_path)
    rec_ckpt = str(rec_dir / "checkpoints" / "best" / "state")
    assert os.path.isdir(os.path.dirname(rec_ckpt))

    # --- 4. the synthetic-eval matrix: PER per method -------------------
    table = {}
    for method, synth in synth_dirs.items():
        out = workdir / f"score_{method}"
        cfg = {"database_name": "gottingen", "datadir": synth,
               "vocab_filepath": vocab_path, "synthetic": True,
               "batch_size": 4, "feature": "vocal_tract",
               "target": "ctc", "loss": "ctc",
               "state_dict_filepath": rec_ckpt,
               "model_params": rec_model}
        info = _run_cli("test_phoneme_recognition", cfg, out, monkeypatch, tmp_path)
        table[method] = info["edit_distance"]

    # The thesis method-comparison table (PER per synthesis method).
    with open(workdir / "method_comparison.json", "w") as f:
        json.dump(table, f, indent=2)
    assert set(table) == {"mean_contour", "encoder_decoder", "autoencoder"}
    for method, per in table.items():
        assert np.isfinite(per) and per >= 0.0, f"{method} PER={per}"
