"""VCV stimulus generation workflow (VERDICT r1 #9).

Reference thesis_config/model_free_phoneme_to_articulation/
generate_vcv_model_free.yaml: synthesize vowel-consonant-vowel stimuli from
TextGrid-only sequences (database ``textgrid_only``), one "subject" per
consonant-stretch factor. Here: train the mean-contour baseline on a tiny
real corpus, then drive cli/generate_vocal_tract_shape over a VCV corpus.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR
from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus, make_vcv_corpus

ARTS = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)


def _run_cli(module_name, cfg, output_dir, monkeypatch, tmp_path):
    import importlib

    cfg_path = tmp_path / f"{module_name}_{len(os.listdir(tmp_path))}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    module = importlib.import_module(f"artspeech_tpu.cli.{module_name}")
    monkeypatch.setattr(
        sys,
        "argv",
        [module_name, "--config", str(cfg_path), "--output_dir", str(output_dir)],
    )
    from artspeech_tpu.cli.common import run_experiment

    return run_experiment(module_name, module.main)


def test_generate_vcv_from_textgrid_only(tmp_path, monkeypatch):
    # 1. Tiny real corpus + mean-contour "training" (phoneme lookup table).
    root = str(tmp_path / "corpus")
    info = make_synthetic_corpus(
        root, subjects=("s1",), sequences=("S01",), n_sentences=2,
        frames_per_sentence=8,
    )
    vocab_path = os.path.join(root, "vocabulary.json")
    with open(vocab_path, "w") as f:
        json.dump(info["phonemes"], f)
    mc_dir = tmp_path / "mc"
    _run_cli(
        "train_phoneme_wise_mean_contour",
        {
            "database_name": "gottingen",
            "datadir": root,
            "vocab_filepath": vocab_path,
            "clip_tails": False,
            "batch_size": 4,
            "articulators": ARTS,
            "train_seq_dict": {"s1": ["S01"]},
            "test_seq_dict": {"s1": ["S01"]},
        },
        mc_dir,
        monkeypatch,
        tmp_path,
    )

    # 2. VCV corpus: TextGrids only, stretch factors as subjects.
    vcv_root = str(tmp_path / "vcv")
    vcv = make_vcv_corpus(vcv_root, consonants=("p", "t"), vowel="a",
                          stretches=(0, 40))
    assert os.path.isfile(
        os.path.join(vcv_root, "stretched0pct", "VCV01", "VCV01.textgrid")
    )

    # 3. Generate through the real CLI (config mirrors
    #    generate_vcv_model_free.yaml with method mean_contour).
    save_to = str(tmp_path / "vcv_out")
    _run_cli(
        "generate_vocal_tract_shape",
        {
            "database_name": "textgrid_only",
            "datadir": vcv_root,
            "vocab_filepath": vocab_path,
            "method": "mean_contour",
            "state_dict_filepath": str(mc_dir / "mean_contour_table.npz"),
            "articulators": ARTS,
            "seq_dict": {"stretched0pct": [], "stretched40pct": []},
            "save_to": save_to,
            "batch_size": 4,
        },
        tmp_path / "gen",
        monkeypatch,
        tmp_path,
    )

    # One output dir per VCV sentence, for both stretch factors; the
    # stretched consonant must add frames.
    def n_frames(subject):
        subj_dir = os.path.join(save_to, subject)
        names = [d for d in sorted(os.listdir(subj_dir)) if "VCV01" in d]
        assert names, f"no VCV01 sentence dir under {subj_dir}"
        sent_dir = os.path.join(subj_dir, names[0])
        contours = os.path.join(sent_dir, "inference_contours")
        assert os.path.isdir(contours), f"missing {contours}"
        tongue = [f for f in os.listdir(contours) if f.endswith("_tongue.npy")]
        assert tongue
        arr = np.load(os.path.join(contours, tongue[0]))
        assert np.isfinite(arr).all()
        with open(os.path.join(sent_dir, "target_sequence.txt")) as f:
            return len(f.read().split())

    frames0 = n_frames("stretched0pct")
    frames40 = n_frames("stretched40pct")
    assert frames40 > frames0, (frames0, frames40)
