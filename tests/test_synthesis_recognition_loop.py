"""The evaluation-by-synthesis integration loop (reference SURVEY.md §4.2):
synthesize a corpus from phonemes -> read it back with
SyntheticPhonemeRecognitionDataset -> score PER with the recognizer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from artspeech_tpu.core.config import DATASET_CONFIG
from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR
from artspeech_tpu.core.vocab import build_vocabulary
from artspeech_tpu.data.recognition import (
    AIR_COLUMN,
    RecognitionLoader,
    SyntheticPhonemeRecognitionDataset,
    TARGET_CTC,
    VOCAL_TRACT,
)
from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus
from artspeech_tpu.eval.recognition import run_recognition_test
from artspeech_tpu.models.artspeech_rnn import ArtSpeech
from artspeech_tpu.models.deepspeech2 import DeepSpeech2
from artspeech_tpu.synth.pipeline import SynthesisDataset, synthesize_corpus
from artspeech_tpu.train.recognition_step import make_recognition_eval_step
from artspeech_tpu.train.state import TrainState
from artspeech_tpu.utils.io import sequences_from_dict

DB = "gottingen"
ARTS = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)


@pytest.fixture(scope="module")
def synthetic_corpus_dir(tmp_path_factory):
    """Real corpus -> ArtSpeech synthesis -> synthetic corpus on disk."""
    root = str(tmp_path_factory.mktemp("loop_corpus"))
    info = make_synthetic_corpus(
        root, subjects=("s1",), sequences=("S01",), n_sentences=2,
        frames_per_sentence=8,
    )
    vocab = build_vocabulary(info["phonemes"])
    model = ArtSpeech(vocab_size=len(vocab), n_articulators=len(ARTS), hidden_size=8)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32)
    )["params"]
    synth_ds = SynthesisDataset(
        root, DB, sequences_from_dict(root, {"s1": []}), vocab, ARTS
    )
    save_to = str(tmp_path_factory.mktemp("loop_synth"))
    written = synthesize_corpus(
        lambda t, l: model.apply({"params": params}, t, l),
        synth_ds,
        save_to,
        DATASET_CONFIG[DB],
        batch_size=2,
        buckets=(16,),
    )
    assert written
    return save_to, vocab


@pytest.mark.parametrize("feature", [VOCAL_TRACT, AIR_COLUMN])
def test_recognize_synthesized_corpus(synthetic_corpus_dir, feature, tmp_path):
    save_to, vocab = synthetic_corpus_dir
    sequences = SyntheticPhonemeRecognitionDataset.sequences_from_corpus(save_to)
    assert len(sequences) == 2
    dataset = SyntheticPhonemeRecognitionDataset(
        datadir=save_to,
        sequences=sequences,
        vocabulary=vocab,
        features=[feature],
        database_name=DB,
    )
    item = dataset[0]
    assert feature in item
    c, d, t = item[feature].shape
    assert c == 2
    if feature == VOCAL_TRACT:
        assert d == len(ARTS) * 50
    else:
        assert d == 2 * 100
    assert item[f"{TARGET_CTC}_length"] > 0
    # Synthetic npys must be loaded RAW: re-normalizing by RES would collapse
    # the dynamic range to ~1/136 of model-output space.
    spread = float(item[feature].max() - item[feature].min())
    assert spread > 0.05, f"degenerate synthetic {feature} features: {spread}"

    loader = RecognitionLoader(dataset, feature, batch_size=2, buckets=(16,), shuffle=False)
    model = DeepSpeech2(
        in_channels=2, num_residual_layers=1, num_rnn_layers=1,
        rnn_hidden_size=8, num_classes=len(vocab), num_features=d,
    )
    batch, _ = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["features"]),
        lengths=jnp.asarray(batch["input_lengths"]),
    )["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())
    eval_step = make_recognition_eval_step(model, "ctc", TARGET_CTC, feature=feature)
    info = run_recognition_test(
        state, eval_step, loader, TARGET_CTC, vocab,
        outputs_dir=str(tmp_path / f"loop_{feature}"),
    )
    # untrained recognizer: PER is bad but finite/defined; the loop runs E2E
    assert np.isfinite(info["loss"])
    assert info["edit_distance"] >= 0.0
    assert 0.0 <= info["word_info_lost"] <= 1.0
    assert os.path.isfile(os.path.join(tmp_path, f"loop_{feature}", "test_results.json"))
