"""CLI-main integration on the CPU mesh: mean-contour train/test -> report.

The heavier CLIs are exercised on real TPU by the verification recipe; this
keeps one full CLI path (config parsing, tracker, artifact layout, report
consumption) under pytest."""

import json
import os
import sys
import types

import numpy as np
import pytest
import yaml

from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR
from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus

ARTS = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)


def _run_cli(module_name, cfg, output_dir, monkeypatch, tmp_path, extra_argv=()):
    import importlib

    cfg_path = tmp_path / f"{module_name}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    module = importlib.import_module(f"artspeech_tpu.cli.{module_name}")
    monkeypatch.setattr(
        sys,
        "argv",
        [module_name, "--config", str(cfg_path), "--output_dir", str(output_dir)]
        + list(extra_argv),
    )
    from artspeech_tpu.cli.common import run_experiment

    return run_experiment(module_name, module.main)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_corpus"))
    info = make_synthetic_corpus(
        root, subjects=("s1",), sequences=("S01", "S02"), n_sentences=2,
        frames_per_sentence=8,
    )
    vocab_path = os.path.join(root, "vocabulary.json")
    with open(vocab_path, "w") as f:
        json.dump(info["phonemes"], f)
    return root, vocab_path


def test_mean_contour_cli_then_report(corpus, tmp_path, monkeypatch):
    root, vocab_path = corpus
    out_dir = tmp_path / "mc"
    cfg = {
        "database_name": "gottingen",
        "datadir": root,
        "vocab_filepath": vocab_path,
        "clip_tails": False,
        "batch_size": 4,
        "articulators": ARTS,
        "train_seq_dict": {"s1": ["S01"]},
        "test_seq_dict": {"s1": ["S02"]},
    }
    info = _run_cli(
        "train_phoneme_wise_mean_contour", cfg, out_dir, monkeypatch, tmp_path
    )
    assert np.isfinite(info["loss"])
    assert (out_dir / "mean_contour_table.npz").exists()
    assert (out_dir / "test_results.json").exists()

    # test-only CLI over the fitted table
    test_cfg = {
        "database_name": "gottingen",
        "datadir": root,
        "vocab_filepath": vocab_path,
        "clip_tails": False,
        "batch_size": 4,
        "articulators": ARTS,
        "table_filepath": str(out_dir / "mean_contour_table.npz"),
        "test_seq_dict": {"s1": ["S02"]},
        "save_to": str(out_dir / "test_outputs" / "0"),
    }
    info2 = _run_cli(
        "test_phoneme_wise_mean_contour", test_cfg, out_dir, monkeypatch, tmp_path
    )
    assert info2["tongue"]["p2cp_mm"] > 0

    # report over the dumped artifacts
    report_cfg = {
        "database_name": "gottingen",
        "results_dir": str(out_dir),
        "articulators": ARTS,
        "make_plots": False,
    }
    report = _run_cli(
        "report_phoneme_to_articulation", report_cfg, tmp_path / "rep",
        monkeypatch, tmp_path,
    )
    assert not report["errors"].empty
    assert (out_dir / "error_report_agg.csv").exists()
    assert (out_dir / "TV_corr_report.csv").exists()
