"""Evaluate a trained recognizer — on a real corpus or a SYNTHESIZED one.

Equivalent of reference test_phoneme_recognition.py:46-169, including the
evaluation-by-synthesis loop: set ``synthetic: true`` (with ``datadir``
pointing at a generate_vocal_tract_shape output dir) to score synthesized
articulation with PER/WIL.

Usage: python -m artspeech_tpu.cli.test_phoneme_recognition --config cfg.yaml
"""

import json
import os

import jax
import jax.numpy as jnp

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.recognition import (
    MELSPEC,
    PhonemeRecognitionDataset,
    RecognitionLoader,
    SyntheticPhonemeRecognitionDataset,
    TARGET_CTC,
    TARGET_ACOUSTIC,
    TARGET_ARTICULATORY,
)
from artspeech_tpu.eval.recognition import run_recognition_test
from artspeech_tpu.losses.recognition import load_class_weights
from artspeech_tpu.models.deepspeech2 import DeepSpeech2
from artspeech_tpu.train.checkpoint import load_params
from artspeech_tpu.train.recognition_step import (
    make_feature_fn,
    make_recognition_eval_step,
)
from artspeech_tpu.train.state import TrainState
from artspeech_tpu.utils.io import sequences_from_dict

TARGET_KEYS = {
    "ctc": TARGET_CTC,
    "acoustic": TARGET_ACOUSTIC,
    "articulatory": TARGET_ARTICULATORY,
}


def main(cfg, args, tracker):
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    feature = cfg.get("feature", "vocal_tract")
    criterion = cfg.get("loss", "ctc")
    target_key = TARGET_KEYS[cfg.get("target", "ctc")]

    voiced_tokens = None
    if cfg.get("voicing_filepath"):
        with open(cfg["voicing_filepath"]) as f:
            voiced_tokens = json.load(f)

    model_params = dict(cfg.get("model_params") or {})
    model = DeepSpeech2(num_classes=len(vocabulary), **model_params)

    if cfg.get("synthetic", False):
        sequences = SyntheticPhonemeRecognitionDataset.sequences_from_corpus(
            cfg["datadir"]
        )
        dataset = SyntheticPhonemeRecognitionDataset(
            datadir=cfg["datadir"],
            sequences=sequences,
            vocabulary=vocabulary,
            features=[feature],
            database_name=cfg.get("database_name", "artspeech"),
            voiced_tokens=voiced_tokens,
        )
    else:
        dataset = PhonemeRecognitionDataset(
            datadir=cfg["datadir"],
            database_name=cfg["database_name"],
            sequences=sequences_from_dict(cfg["datadir"], cfg["test_seq_dict"]),
            vocabulary=vocabulary,
            features=[feature],
            voiced_tokens=voiced_tokens,
        )
    loader = RecognitionLoader(
        dataset, feature, batch_size=cfg.get("batch_size", 4), shuffle=False
    )

    # Template init then restore.
    feature_fn = make_feature_fn(feature)
    t = 64
    if feature == MELSPEC:
        sample = {"audio": jnp.zeros((1, (t - 1) * 256)), "input_lengths": jnp.full((1,), t, jnp.int32)}
    else:
        d = model_params.get("num_features", 500)
        c = model_params.get("in_channels", 2)
        sample = {
            "features": jnp.zeros((1, c, d, t)),
            "input_lengths": jnp.full((1,), t, jnp.int32),
        }
    template = model.init(
        jax.random.PRNGKey(0), feature_fn(sample), lengths=sample["input_lengths"]
    )["params"]
    params = load_params(cfg["state_dict_filepath"], template)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=__import__("optax").identity()
    )

    class_weights = None
    if cfg.get("class_weights_filepath"):
        class_weights = load_class_weights(cfg["class_weights_filepath"], vocabulary)

    eval_step = make_recognition_eval_step(
        model,
        criterion,
        target_key,
        feature=feature,
        use_voicing=cfg.get("use_voicing", False),
        class_weights=class_weights,
        return_features=True,
    )
    info = run_recognition_test(
        state,
        eval_step,
        loader,
        target_key,
        vocabulary,
        outputs_dir=os.path.join(args.output_dir, "test_outputs"),
        use_beam=cfg.get("use_beam", False),
        collect_features=True,
    )
    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Test DeepSpeech2 phoneme recognizer", main)
