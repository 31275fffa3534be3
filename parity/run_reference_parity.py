"""End-to-end parity: run the ACTUAL reference scripts vs our CLIs.

Builds one synthetic corpus, then measures (VERDICT r1 #4):

1. mean-contour: reference train_phoneme_wise_mean_contour.py vs our CLI on
   the same split — same loss within tolerance (the reference hard-codes a
   10%-per-token subsample; ours defaults to the full table).
2. encoder_decoder: reference train_phoneme_to_articulation.py (torch),
   then its best_model.pt imported into our flax ArtSpeech via
   utils.torch_import.convert_artspeech_state_dict and evaluated with our
   harness — loss must MATCH (same weights, two stacks).
3. recognizer: reference train_phoneme_recognition.py (torch DeepSpeech2,
   CTC on vocal_tract), its best_model.pt imported via
   convert_deepspeech2_state_dict — logits within 1e-4 and PER equal under
   the deterministic protocol. (The reference's own run_test never calls
   model.eval(), so its printed PER carries live-dropout noise — a
   reference bug, documented in PARITY.md.)

Usage:
    python parity/run_reference_parity.py [--workdir /tmp/parity_run]
Writes <workdir>/parity_results.json and prints a markdown table.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "parity", "refshims")
REFERENCE = "/root/reference"
WRAPPER = os.path.join(REPO, "parity", "run_ref_script.py")

PHONETIC_TOKENS = [
    "t", "d", "n", "l", "z", "s", "p", "b", "m", "f", "v", "k", "g", "Z",
    "S", "i", "e", "E", "E/", "U~/", "j", "u", "o", "O", "O/", "o~", "w",
    "a", "a~", "y", "2", "9", "H",
]


def _env(workdir, artifacts):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = env.get("JAX_PLATFORMS", "cpu")
    env["REF_PARITY_BASE"] = os.path.join(workdir, "base")
    env["REF_PARITY_ARTIFACTS"] = artifacts
    env["PYTHONPATH"] = os.pathsep.join([SHIMS, REFERENCE, REPO])
    return env


def run_reference(script, config, workdir, tag):
    artifacts = os.path.join(workdir, "artifacts", tag)
    os.makedirs(artifacts, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, WRAPPER, os.path.join(REFERENCE, script),
         "--config", config],
        env=_env(workdir, artifacts),
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference {script} failed rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
        )
    return artifacts


def build_corpus(workdir, n_sentences=4, frames_per_sentence=20):
    from artspeech_tpu.data.synthetic_corpus import make_synthetic_corpus

    root = os.path.join(workdir, "corpus")
    shutil.rmtree(root, ignore_errors=True)
    make_synthetic_corpus(
        root, subjects=("s1",), sequences=("S01", "S02", "S03"),
        n_sentences=n_sentences, frames_per_sentence=frames_per_sentence,
    )
    base = json.load(open(os.path.join(root, "vocabulary.json"))) if os.path.isfile(
        os.path.join(root, "vocabulary.json")
    ) else []
    from artspeech_tpu.data.synthetic_corpus import DEFAULT_PHONEMES

    vocab = sorted(set(base) | set(DEFAULT_PHONEMES) | set(PHONETIC_TOKENS))
    with open(os.path.join(root, "vocabulary.json"), "w") as f:
        json.dump(vocab, f)
    return root


def base_cfg(root):
    from artspeech_tpu.core.constants import TUBE_ARTICULATORS, UPPER_INCISOR

    arts = sorted(a for a in TUBE_ARTICULATORS if a != UPPER_INCISOR)
    return {
        "database_name": "gottingen",
        "datadir": root,
        "vocab_filepath": os.path.join(root, "vocabulary.json"),
        "clip_tails": False,
        "articulators": arts,
        "train_seq_dict": {"s1": ["S01", "S02"]},
        "test_seq_dict": {"s1": ["S03"]},
    }


def mean_contour_leg(root, workdir):
    """Reference vs our mean-contour CLI on the same split."""
    import yaml

    cfg = base_cfg(root)
    ref_cfg = os.path.join(workdir, "mc_ref.yaml")
    yaml.safe_dump(cfg, open(ref_cfg, "w"))
    artifacts = run_reference(
        "train_phoneme_wise_mean_contour.py", ref_cfg, workdir, "mc_ref"
    )
    ref = json.load(open(os.path.join(artifacts, "test_results.json")))

    # reference_sampling replicates the reference's fixed-seed 10% row
    # subsample per token, so the table (and thus the loss) should match
    # to float precision rather than to sampling noise.
    ours_cfg = dict(cfg, batch_size=4, reference_sampling=True)
    cfg_path = os.path.join(workdir, "mc_ours.yaml")
    yaml.safe_dump(ours_cfg, open(cfg_path, "w"))
    out_dir = os.path.join(workdir, "mc_ours")
    subprocess.run(
        [sys.executable, "-m", "artspeech_tpu.cli.train_phoneme_wise_mean_contour",
         "--config", cfg_path, "--output_dir", out_dir],
        env={**os.environ, "PYTHONPATH": REPO,
             "JAX_PLATFORMS": os.environ.get("JAX_PLATFORMS", "cpu")},
        check=True, capture_output=True, text=True, timeout=1800,
    )
    ours = json.load(open(os.path.join(out_dir, "test_results.json")))
    return {
        "reference_loss": ref["loss"],
        "ours_loss": ours["loss"],
        "rel_diff": abs(ref["loss"] - ours["loss"]) / ref["loss"],
        "note": "both sides use the reference's fixed-seed 10% row subsample",
    }


def encoder_decoder_leg(root, workdir, num_epochs=10):
    """Reference BiGRU trained in torch, weights imported into flax,
    evaluated with our harness on the same test split."""
    import yaml

    import jax
    import jax.numpy as jnp

    from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
    from artspeech_tpu.core.vocab import load_vocabulary
    from artspeech_tpu.data.batching import BucketedLoader
    from artspeech_tpu.data.datasets import ArtSpeechDataset
    from artspeech_tpu.eval.articulation import run_test
    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.utils.io import sequences_from_dict
    from artspeech_tpu.utils.torch_import import (
        convert_artspeech_state_dict,
        load_torch_state_dict,
    )

    cfg = base_cfg(root)
    cfg.update(
        num_epochs=num_epochs, batch_size=4, patience=30, learning_rate=1e-3,
        weight_decay=0.0, valid_seq_dict={"s1": ["S03"]},
        model_kwargs={"hidden_size": 64},
    )
    ref_cfg = os.path.join(workdir, "ed_ref.yaml")
    yaml.safe_dump(cfg, open(ref_cfg, "w"))
    artifacts = run_reference(
        "train_phoneme_to_articulation.py", ref_cfg, workdir, "ed_ref"
    )
    ref = json.load(open(os.path.join(artifacts, "test_results.json")))

    sd = load_torch_state_dict(os.path.join(artifacts, "best_model.pt"))
    params = jax.tree.map(
        jnp.asarray, convert_artspeech_state_dict(sd)
    )
    arts = cfg["articulators"]
    vocab = load_vocabulary(cfg["vocab_filepath"])
    model = ArtSpeech(vocab_size=len(vocab), n_articulators=len(arts), hidden_size=64)
    ds = ArtSpeechDataset(
        root, "gottingen", sequences_from_dict(root, cfg["test_seq_dict"]),
        vocab, arts, clip_tails=False,
    )
    loader = BucketedLoader(ds, batch_size=4, shuffle=False)

    def apply_fn(p, tokens, lengths):
        return model.apply({"params": p}, tokens, lengths)

    info = run_test(
        params, apply_fn, loader, arts,
        to_mm=mm_per_unit(DATASET_CONFIG["gottingen"]),
        outputs_dir=os.path.join(workdir, "ed_import_eval"),
    )
    y_corr_pairs = [(ref[a]["y_corr"], info[a]["y_corr"]) for a in arts]
    return {
        "reference_loss": ref["loss"],
        "ours_loss_imported_weights": info["loss"],
        "loss_abs_diff": abs(ref["loss"] - info["loss"]),
        "max_y_corr_abs_diff": max(abs(r - o) for r, o in y_corr_pairs),
        "note": "same torch-trained weights through both stacks; x_corr "
                "differs by design (reference metrics.py:22 uses the "
                "outputs' mean for the targets)",
    }


def recognizer_leg(root, workdir, num_epochs=4):
    """Reference DeepSpeech2 trained in torch, weights imported into flax;
    deterministic-eval PER and logits compared."""
    import yaml

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from artspeech_tpu.core.constants import BLANK, UNKNOWN
    from artspeech_tpu.data.recognition import (
        PhonemeRecognitionDataset,
        RecognitionLoader,
        TARGET_CTC,
        VOCAL_TRACT,
    )
    from artspeech_tpu.eval.recognition import run_recognition_test
    from artspeech_tpu.models.deepspeech2 import DeepSpeech2
    from artspeech_tpu.train.recognition_step import make_recognition_eval_step
    from artspeech_tpu.train.state import TrainState
    from artspeech_tpu.utils.io import sequences_from_dict
    from artspeech_tpu.utils.torch_import import (
        convert_deepspeech2_state_dict,
        load_torch_state_dict,
    )

    model_params = {
        "in_channels": 2, "num_residual_layers": 1, "num_rnn_layers": 1,
        "rnn_hidden_size": 32, "num_features": 500,
        "adapter_out_features": 80, "dropout": 0.1,
    }
    cfg = base_cfg(root)
    del cfg["articulators"], cfg["clip_tails"]
    cfg.update(
        num_epochs=num_epochs, batch_size=4, patience=30, learning_rate=1e-3,
        weight_decay=0.0, feature="vocal_tract", target="ctc_target",
        plot_target="articulatory_target", loss="CTC",
        loss_params={"zero_infinity": True}, model_params=model_params,
        valid_seq_dict={"s1": ["S03"]},
    )
    ref_cfg = os.path.join(workdir, "rec_ref.yaml")
    yaml.safe_dump(cfg, open(ref_cfg, "w"))
    artifacts = run_reference(
        "train_phoneme_recognition.py", ref_cfg, workdir, "rec_ref"
    )
    ref = json.load(open(os.path.join(artifacts, "info_test.json")))

    tokens = json.load(open(cfg["vocab_filepath"]))
    vocab = {BLANK: 0, UNKNOWN: 1}
    for t in tokens:
        vocab.setdefault(t, len(vocab))

    sd = load_torch_state_dict(os.path.join(artifacts, "best_model.pt"))
    params = jax.tree.map(
        jnp.asarray,
        convert_deepspeech2_state_dict(sd, num_residual_layers=1, num_rnn_layers=1),
    )
    model = DeepSpeech2(num_classes=len(vocab), **model_params)
    ds = PhonemeRecognitionDataset(
        datadir=root, database_name="gottingen",
        sequences=sequences_from_dict(root, cfg["test_seq_dict"]),
        vocabulary=vocab, features=[VOCAL_TRACT],
    )
    loader = RecognitionLoader(ds, VOCAL_TRACT, batch_size=4, shuffle=False)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())
    eval_step = make_recognition_eval_step(model, "ctc", TARGET_CTC, feature=VOCAL_TRACT)
    info = run_recognition_test(
        state, eval_step, loader, TARGET_CTC, vocab,
        outputs_dir=os.path.join(workdir, "rec_import_eval"),
    )

    # Deterministic logit check on one unpadded sentence.
    item = ds[0]
    feat = jnp.asarray(item[VOCAL_TRACT])[None].astype(jnp.float32)
    ours_logits = np.asarray(model.apply({"params": params}, feat))
    import torch

    from artspeech_tpu.utils.torch_import import load_torch_state_dict as _  # noqa

    sys.path.insert(0, SHIMS)
    sys.path.insert(0, REFERENCE)
    from phoneme_recognition.deepspeech2 import DeepSpeech2 as RefDS2

    ref_model = RefDS2(num_classes=len(vocab), **model_params)
    ref_model.load_state_dict(
        torch.load(os.path.join(artifacts, "best_model.pt"), map_location="cpu")
    )
    ref_model.eval()
    with torch.no_grad():
        ref_logits = ref_model(
            torch.from_numpy(np.asarray(feat)).float()
        ).numpy()
    return {
        "reference_edit_distance_traindropout": ref["edit_distance"],
        "ours_edit_distance": info["edit_distance"],
        "logits_max_abs_diff": float(np.abs(ours_logits - ref_logits).max()),
        "note": "reference run_test never calls model.eval() so its PER "
                "carries live dropout; logits compared in eval mode",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/parity_run")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    root = build_corpus(args.workdir)
    results = {
        "mean_contour": mean_contour_leg(root, args.workdir),
        "encoder_decoder": encoder_decoder_leg(
            root, args.workdir, num_epochs=3 if args.quick else 10
        ),
        "recognizer": recognizer_leg(
            root, args.workdir, num_epochs=2 if args.quick else 4
        ),
    }
    out = os.path.join(args.workdir, "parity_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"\nwritten: {out}")


if __name__ == "__main__":
    main()
