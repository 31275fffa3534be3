"""Convergence gate for the bf16 production profile (VERDICT r2 #9).

Each of the three neural trainers runs twice through its REAL CLI on the
synthetic corpus — once f32, once with the `compute_dtype: bfloat16` key the
configs/**/train_*_bf16.yaml profiles use — and the bf16 run's final valid
metrics must land within a band of the f32 run's. Seeds/data are identical,
so the only difference is compute precision (params stay f32 either way).

Tiny models + 2 epochs: the point is that bf16 compute does not break or
bias optimization, not metric quality (the real-speed numbers live in
benchmarks/BENCH_DETAILS.md "bf16 compute knob").
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
NUM_FEATURES = len(ARTS) * 50


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bf16_corpus"))
    info = make_synthetic_corpus(
        root, subjects=("s1",), sequences=("S01", "S02"), n_sentences=3,
        frames_per_sentence=8,
    )
    vocab_path = os.path.join(root, "vocabulary.json")
    with open(vocab_path, "w") as f:
        json.dump(info["phonemes"], f)
    return root, vocab_path


def _run_train_cli(module_name, cfg, output_dir, monkeypatch, tmp_path, tag):
    import importlib

    cfg_path = tmp_path / f"{module_name}_{tag}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    module = importlib.import_module(f"artspeech_tpu.cli.{module_name}")
    monkeypatch.setattr(
        sys,
        "argv",
        [module_name, "--config", str(cfg_path), "--output_dir",
         str(output_dir), "--run_name", "run"],
    )
    from artspeech_tpu.cli.common import run_experiment

    run_experiment(module_name, module.main)
    with open(os.path.join(output_dir, "run", "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def _base_cfg(root, vocab_path):
    return {
        "database_name": "gottingen",
        "datadir": root,
        "vocab_filepath": vocab_path,
        "clip_tails": False,
        "batch_size": 4,
        "num_epochs": 2,
        "patience": 5,
        "learning_rate": 1e-3,
        "articulators": ARTS,
        "train_seq_dict": {"s1": ["S01"]},
        "valid_seq_dict": {"s1": ["S02"]},
        "test_seq_dict": {"s1": ["S02"]},
        "seed": 0,
    }


def _gate(f32_metrics, bf16_metrics, keys, rtol):
    """bf16 final-epoch metrics must be finite and within rtol of f32."""
    last_f32, last_bf16 = f32_metrics[-1], bf16_metrics[-1]
    for key in keys:
        a, b = float(last_f32[key]), float(last_bf16[key])
        assert np.isfinite(b), f"{key} not finite under bf16"
        assert abs(b - a) <= rtol * max(abs(a), 1e-3), (
            f"{key}: bf16 {b} vs f32 {a} exceeds rtol={rtol}"
        )


def test_bigru_bf16_convergence_gate(corpus, tmp_path, monkeypatch):
    root, vocab_path = corpus
    cfg = {**_base_cfg(root, vocab_path), "model_kwargs": {"hidden_size": 16}}
    f32 = _run_train_cli(
        "train_phoneme_to_articulation", cfg, tmp_path / "f32",
        monkeypatch, tmp_path, "f32",
    )
    bf16 = _run_train_cli(
        "train_phoneme_to_articulation",
        {**cfg, "compute_dtype": "bfloat16"},
        tmp_path / "bf16", monkeypatch, tmp_path, "bf16",
    )
    _gate(f32, bf16, ("valid_loss", "valid_p2cp_mm"), rtol=0.15)


def test_transformer_bf16_convergence_gate(corpus, tmp_path, monkeypatch):
    root, vocab_path = corpus
    cfg = {
        **_base_cfg(root, vocab_path),
        "model_kwargs": {
            "embed_dim": 16, "num_heads": 2, "num_layers": 1,
            "encoder_ff_dim": 32,
        },
    }
    f32 = _run_train_cli(
        "train_phoneme_to_articulation_transformer", cfg, tmp_path / "f32",
        monkeypatch, tmp_path, "f32",
    )
    bf16 = _run_train_cli(
        "train_phoneme_to_articulation_transformer",
        {**cfg, "compute_dtype": "bfloat16"},
        tmp_path / "bf16", monkeypatch, tmp_path, "bf16",
    )
    _gate(f32, bf16, ("valid_loss", "valid_p2cp_mm"), rtol=0.15)


def test_recognizer_bf16_convergence_gate(corpus, tmp_path, monkeypatch):
    root, vocab_path = corpus
    cfg = {**_base_cfg(root, vocab_path), "feature": "vocal_tract",
           "target": "ctc", "loss": "ctc",
           "model_params": {
               "in_channels": 2, "num_residual_layers": 1,
               "num_rnn_layers": 1, "rnn_hidden_size": 16,
               "num_features": NUM_FEATURES, "adapter_out_features": 16,
               "dropout": 0.1,
           }}
    del cfg["articulators"]
    f32 = _run_train_cli(
        "train_phoneme_recognition", cfg, tmp_path / "f32",
        monkeypatch, tmp_path, "f32",
    )
    bf16 = _run_train_cli(
        "train_phoneme_recognition",
        {**cfg, "compute_dtype": "bfloat16"},
        tmp_path / "bf16", monkeypatch, tmp_path, "bf16",
    )
    _gate(f32, bf16, ("valid_loss",), rtol=0.15)
