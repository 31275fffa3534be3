"""Train the DeepSpeech2 phoneme recognizer.

Equivalent of reference train_phoneme_recognition.py:51-329: CTC or CE over
melspec / vocal_tract / air_column features, Adam + CyclicLR, early stopping
on valid edit distance, final test with substitution/confusion artifacts.

Usage: python -m artspeech_tpu.cli.train_phoneme_recognition --config cfg.yaml
Config keys mirror the reference: datadir, database_name, num_epochs,
batch_size, patience, learning_rate, weight_decay, feature, target, loss
(ctc|ce), train/valid/test_seq_dict, vocab_filepath, model_params,
voicing_filepath, use_voicing, logits_large_margins, class_weights_filepath.
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.constants import BLANK, SIL, UNKNOWN
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.recognition import (
    MELSPEC,
    PhonemeRecognitionDataset,
    RecognitionLoader,
    TARGET_CTC,
    TARGET_ACOUSTIC,
    TARGET_ARTICULATORY,
)
from artspeech_tpu.eval.recognition import run_recognition_test
from artspeech_tpu.losses.recognition import load_class_weights
from artspeech_tpu.models.deepspeech2 import DeepSpeech2
from artspeech_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from artspeech_tpu.train.recognition_step import (
    cyclic_triangular_schedule,
    make_recognition_eval_step,
    make_recognition_train_step,
)
from artspeech_tpu.train.state import TrainState, count_parameters
from artspeech_tpu.utils.io import sequences_from_dict

TARGET_KEYS = {
    "ctc": TARGET_CTC,
    "acoustic": TARGET_ACOUSTIC,
    "articulatory": TARGET_ARTICULATORY,
}


def sample_batch_for(feature: str, cfg, model_params):
    b = cfg["batch_size"]
    t = 64
    if feature == MELSPEC:
        return {
            "audio": jnp.zeros((b, (t - 1) * 256), jnp.float32),
            "input_lengths": jnp.full((b,), t, jnp.int32),
            "voicing": jnp.zeros((b, t), jnp.float32),
        }
    d = model_params.get("num_features", 500)
    c = model_params.get("in_channels", 2)
    return {
        "features": jnp.zeros((b, c, d, t), jnp.float32),
        "input_lengths": jnp.full((b,), t, jnp.int32),
        "voicing": jnp.zeros((b, t), jnp.float32),
    }


def main(cfg, args, tracker):
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    feature = cfg.get("feature", "melspec")
    criterion = cfg.get("loss", "ctc")
    target_key = TARGET_KEYS[cfg.get("target", "ctc")]
    use_voicing = cfg.get("use_voicing", False)

    voiced_tokens = None
    if cfg.get("voicing_filepath"):
        with open(cfg["voicing_filepath"]) as f:
            voiced_tokens = json.load(f)

    from artspeech_tpu.cli.common import model_kwargs_from_cfg

    model_params = model_kwargs_from_cfg(cfg, key="model_params")
    pretrained_params = None
    if cfg.get("pretrained", False):
        # LibriSpeech-pretrained init with a fresh classifier head
        # (reference train_phoneme_recognition.py:112-118).
        from artspeech_tpu.utils.torch_import import load_librispeech_deepspeech2

        model, pretrained_params = load_librispeech_deepspeech2(
            cfg["pretrained_filepath"],
            num_classes=len(vocabulary),
            num_features=model_params.get("num_features", 80),
            adapter_out_features=model_params.get("adapter_out_features"),
            dtype=model_params.get("dtype"),
        )
    else:
        model = DeepSpeech2(num_classes=len(vocabulary), **model_params)

    class_weights = None
    if cfg.get("class_weights_filepath"):
        class_weights = load_class_weights(
            cfg["class_weights_filepath"], vocabulary
        )

    loaders = {}
    tmp_dir = tempfile.mkdtemp() if feature == MELSPEC else None
    for split, key, shuffle in (
        ("train", "train_seq_dict", True),
        ("valid", "valid_seq_dict", False),
        ("test", "test_seq_dict", False),
    ):
        dataset = PhonemeRecognitionDataset(
            datadir=cfg["datadir"],
            database_name=cfg["database_name"],
            sequences=sequences_from_dict(cfg["datadir"], cfg[key]),
            vocabulary=vocabulary,
            features=[feature],
            voiced_tokens=voiced_tokens,
            tmp_dir=tmp_dir,
        )
        loaders[split] = RecognitionLoader(
            dataset,
            feature,
            batch_size=cfg["batch_size"],
            shuffle=shuffle,
            # dp-shardable batch dim (dummy rows have input_length 0)
            pad_to_multiple=len(jax.devices()),
        )

    # Init model/optimizer (CyclicLR per optimizer step, reference :184-189).
    lr = cfg["learning_rate"]
    schedule = cyclic_triangular_schedule(lr / 25, lr)
    tx = optax.adamw(schedule, weight_decay=cfg.get("weight_decay", 0.0))
    sample = sample_batch_for(feature, cfg, model_params)
    from artspeech_tpu.train.recognition_step import make_feature_fn

    feature_fn = make_feature_fn(feature)
    if pretrained_params is not None:
        params = pretrained_params
    else:
        params = model.init(
            jax.random.PRNGKey(cfg.get("seed", 0)),
            feature_fn(sample),
            lengths=sample["input_lengths"],
        )["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if args.checkpoint_filepath:
        state, _ = restore_checkpoint(args.checkpoint_filepath, state)

    # Data-parallel by default: replicate state over a dp mesh and shard
    # every batch over the data axis (1-device mesh on a single chip).
    from artspeech_tpu.data.batching import prefetch_to_device
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import batch_sharding, data_parallel_mesh

    mesh = data_parallel_mesh(loaders["train"].collate_batch_size)
    state = distribute_state(state, mesh)
    sharding = batch_sharding(mesh)

    tracker.log_params({"num_network_params": count_parameters(params)})
    print(f"DeepSpeech2 -- {count_parameters(params)} parameters")

    # Serving-batch training scans thesis-batch (8) microbatches inside the
    # jitted step — the recognizer's per-frame throughput degrades past the
    # thesis batch exactly like the transformer's (measured B=8 211k -> B=64
    # 94k frames/s f32; recognizer_accum_steps). ``accum_steps`` in the
    # config overrides (1 = reference-exact batching).
    from artspeech_tpu.train.recognition_step import recognizer_accum_steps

    accum = cfg.get(
        "accum_steps",
        recognizer_accum_steps(
            loaders["train"].collate_batch_size, mesh.size, dtype=model.dtype
        ),
    )
    if accum > 1:
        print(f"recognition train step: accum_steps={accum} "
              f"(collate batch {loaders['train'].collate_batch_size})")
    train_step = make_recognition_train_step(
        model,
        criterion,
        target_key,
        feature=feature,
        use_voicing=use_voicing,
        logits_large_margins=cfg.get("logits_large_margins", 0.0),
        class_weights=class_weights,
        accum_steps=accum,
    )
    eval_step = make_recognition_eval_step(
        model,
        criterion,
        target_key,
        feature=feature,
        use_voicing=use_voicing,
        class_weights=class_weights,
    )

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    best_dir = os.path.join(ckpt_dir, "best")
    best_metric, since_best = float("inf"), 0
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    for epoch in range(cfg["num_epochs"]):
        loss_sum, weight_sum = 0.0, 0.0
        for batch, meta in prefetch_to_device(loaders["train"], sharding=sharding):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            w = float(meta.get("n_real", 1))  # sentence-weighted epoch mean
            loss_sum += w * metrics["loss"]
            weight_sum += w
        train_loss = (
            float(jax.device_get(loss_sum)) / weight_sum if weight_sum else float("nan")
        )

        valid_info = run_recognition_test(
            state, eval_step, loaders["valid"], target_key, vocabulary
        )
        record = {
            "train_loss": train_loss,
            "valid_loss": valid_info["loss"],
            "valid_edit_distance": valid_info["edit_distance"],
        }
        tracker.log_metrics(record, step=epoch)
        print(f"epoch {epoch}: {record}")

        if valid_info["edit_distance"] < best_metric:
            best_metric, since_best = valid_info["edit_distance"], 0
            save_checkpoint(best_dir, state, aux={"epoch": epoch, "edit_distance": best_metric})
        else:
            since_best += 1
        save_checkpoint(
            os.path.join(ckpt_dir, "last"),
            state,
            aux={"epoch": epoch, "best_metric": best_metric, "epochs_since_best": since_best},
        )
        if since_best > cfg.get("patience", 30):
            break

    state, _ = restore_checkpoint(best_dir, state)
    eval_step_f = make_recognition_eval_step(
        model,
        criterion,
        target_key,
        feature=feature,
        use_voicing=use_voicing,
        class_weights=class_weights,
        return_features=True,
    )
    info = run_recognition_test(
        state,
        eval_step_f,
        loaders["test"],
        target_key,
        vocabulary,
        outputs_dir=os.path.join(args.output_dir, "test_outputs"),
        collect_features=True,
    )
    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Train DeepSpeech2 phoneme recognizer", main)
