"""End-to-end smoke tests: train a few steps -> eval with artifacts ->
synthesize a corpus -> mean-contour baseline. Runs on the 8-device CPU mesh
(conftest) with a tiny synthetic corpus."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR
from artspeech_tpu.core.vocab import build_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.datasets import ArtSpeechDataset
from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus
from artspeech_tpu.eval.articulation import run_test
from artspeech_tpu.models.artspeech_rnn import ArtSpeech
from artspeech_tpu.models.mean_contour import (
    fit_mean_contour,
    make_mean_contour_forward,
    relative_positions,
)
from artspeech_tpu.synth.pipeline import SynthesisDataset, synthesize_corpus
from artspeech_tpu.train.loop import fit
from artspeech_tpu.train.state import create_train_state
from artspeech_tpu.train.step import (
    make_artspeech_eval_step,
    make_artspeech_train_step,
)
from artspeech_tpu.utils.io import sequences_from_dict

DB = "gottingen"
ARTICULATORS = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_corpus"))
    return make_synthetic_corpus(
        root,
        subjects=("s1",),
        sequences=("S01", "S02"),
        n_sentences=3,
        frames_per_sentence=10,
    )


@pytest.fixture(scope="module")
def setup(corpus):
    vocab = build_vocabulary(corpus["phonemes"])
    seqs = sequences_from_dict(corpus["root"], {"s1": ["S01"]})
    dataset = ArtSpeechDataset(
        corpus["root"], DB, seqs, vocab, ARTICULATORS, clip_tails=False
    )
    loader = BucketedLoader(dataset, batch_size=4, buckets=(16,), shuffle=False)
    return vocab, dataset, loader


def test_fit_and_eval_with_artifacts(setup, tmp_path):
    vocab, dataset, loader = setup
    to_mm = mm_per_unit(DATASET_CONFIG[DB])
    model = ArtSpeech(
        vocab_size=len(vocab), n_articulators=len(ARTICULATORS), hidden_size=16
    )
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (jnp.zeros((4, 16), jnp.int32), jnp.full((4,), 16, jnp.int32)),
        learning_rate=1e-3,
    )
    ckpt_dir = str(tmp_path / "ckpts")
    result = fit(
        state,
        loader,
        loader,
        make_artspeech_train_step(to_mm=to_mm),
        make_artspeech_eval_step(to_mm=to_mm),
        n_epochs=2,
        checkpoints_dir=ckpt_dir,
        patience=5,
    )
    assert len(result.history) == 2
    assert np.isfinite(result.best_metric)
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    # loss decreased between epochs on this tiny overfit set
    assert result.history[1]["train_loss"] <= result.history[0]["train_loss"]

    outputs_dir = str(tmp_path / "test_outputs")

    def apply_fn(params, tokens, lengths):
        return model.apply({"params": params}, tokens, lengths)

    info = run_test(
        result.state.params,
        apply_fn,
        loader,
        ARTICULATORS,
        to_mm=to_mm,
        outputs_dir=outputs_dir,
        regularize_out=True,
    )
    assert np.isfinite(info["loss"])
    for art in ARTICULATORS:
        assert set(info[art]) == {"x_corr", "y_corr", "p2cp", "p2cp_mm", "med", "med_mm"}
        assert info[art]["p2cp_mm"] == pytest.approx(info[art]["p2cp"] * to_mm)

    # artifact schema: contours + phonemes.csv + tract_variables.csv
    sentence_dirs = [d for d in glob.glob(os.path.join(outputs_dir, "*")) if os.path.isdir(d)]
    assert len(sentence_dirs) == 3
    d = sentence_dirs[0]
    phon_df0 = pd.read_csv(os.path.join(d, "phonemes.csv"))
    n_frames = len(phon_df0)
    npys = glob.glob(os.path.join(d, "contours", "*.npy"))
    # n_frames x (10 arts + injected incisor) x {pred, true}
    assert len(npys) == n_frames * 11 * 2
    sample = np.load(npys[0])
    assert sample.shape == (2, 50)
    tv_df = pd.read_csv(os.path.join(d, "tract_variables.csv"))
    assert len(tv_df) == n_frames
    for tv in ("LA", "TTCD", "TBCD", "VEL"):
        assert f"{tv}_pred" in tv_df and f"{tv}_target" in tv_df
        assert np.isfinite(tv_df[f"{tv}_pred"]).all()
    phon_df = pd.read_csv(os.path.join(d, "phonemes.csv"))
    assert list(phon_df.columns) == ["sentence", "frame", "phoneme"]


def test_synthesize_corpus(setup, corpus, tmp_path):
    vocab, _, _ = setup
    model = ArtSpeech(
        vocab_size=len(vocab), n_articulators=len(ARTICULATORS), hidden_size=16
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32)
    )["params"]

    def forward(tokens, lengths):
        return model.apply({"params": params}, tokens, lengths)

    seqs = sequences_from_dict(corpus["root"], {"s1": ["S02"]})
    synth_ds = SynthesisDataset(corpus["root"], DB, seqs, vocab, ARTICULATORS)
    save_to = str(tmp_path / "synth")
    written = synthesize_corpus(
        forward,
        synth_ds,
        save_to,
        DATASET_CONFIG[DB],
        batch_size=2,
        buckets=(16,),
    )
    assert len(written) == 3
    d = written[0]
    assert os.path.isfile(os.path.join(d, "target_sequence.txt"))
    contour_files = glob.glob(os.path.join(d, "inference_contours", "*.npy"))
    n_frames = len(open(os.path.join(d, "target_sequence.txt")).read().split())
    assert len(contour_files) == n_frames * 11  # 10 arts + canonical incisor
    air = sorted(glob.glob(os.path.join(d, "air_column", "*.npy")))
    assert len(air) == n_frames
    ac = np.load(air[0])
    assert ac.shape == (2, 2, 100)
    assert np.isfinite(ac).all()
    xarts = glob.glob(os.path.join(d, "xarticul", "*.txt"))
    assert len(xarts) == n_frames
    lines = open(xarts[0]).read().strip().splitlines()
    assert lines.count("-1 -1") == 2  # two wall blocks


def test_mean_contour_baseline(setup):
    vocab, dataset, loader = setup
    table = fit_mean_contour(dataset, vocab_size=len(vocab))
    assert table.table.shape == (len(vocab), len(ARTICULATORS), 2, 50)
    assert table.counts.sum() == sum(dataset[i]["length"] for i in range(len(dataset)))

    forward = make_mean_contour_forward(table)
    item = dataset[0]
    out = forward(jnp.asarray(item["tokens"][None]))
    assert out.shape == (1, item["length"], len(ARTICULATORS), 2, 50)
    # exact lookup: frame whose token t must equal table[t]
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), table.table[item["tokens"][0]], rtol=1e-6
    )

    # positional variant
    table_pos = fit_mean_contour(dataset, vocab_size=len(vocab), n_bins=4)
    fwd_pos = make_mean_contour_forward(table_pos)
    out_pos = fwd_pos(jnp.asarray(item["tokens"][None]))
    assert out_pos.shape == out.shape
    assert np.isfinite(np.asarray(out_pos)).all()


def test_relative_positions():
    rel = relative_positions([5, 5, 5, 7, 7, 9])
    np.testing.assert_allclose(rel, [1 / 3, 2 / 3, 1.0, 0.5, 1.0, 1.0])
