"""Train the latent sequence model (phonemes -> principal components).

Equivalent of reference train_phoneme_to_principal_components.py:58-471:
PrincipalComponentsArtSpeech trained with the AutoencoderLoss composite
(frozen AE + critical loss + optional frozen recognizer), valid metric =
decoder P2CP-mm, final test with TV/contour dumps.

Usage: python -m artspeech_tpu.cli.train_phoneme_to_principal_components \
           --config cfg.yaml
Config keys: datadir, database_name, num_epochs, batch_size, patience,
learning_rate, weight_decay, indices_dict, vocab_filepath,
encoder_state_dict_filepath, decoder_state_dict_filepath,
beta1..beta4, rescale_factor, TV_to_phoneme_map, model_kwargs (rnn=GRU|LSTM),
recognizer (optional: {state_dict_filepath, model_params}), clip_tails, seed.
"""

import json
import os

import jax
import jax.numpy as jnp
import optax

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.pc_datasets import (
    PrincipalComponentsDataset,
    load_norm_stats,
    stack_norm_stats,
)
from artspeech_tpu.eval.autoencoder import run_latent_rnn_test
from artspeech_tpu.losses.autoencoder import make_autoencoder_loss
from artspeech_tpu.models.autoencoder import (
    MultiDecoder,
    MultiEncoder,
    normalize_indices_dict,
)
from artspeech_tpu.models.deepspeech2 import DeepSpeech2
from artspeech_tpu.models.latent_rnn import PrincipalComponentsArtSpeech
from artspeech_tpu.train.checkpoint import load_params, restore_checkpoint
from artspeech_tpu.train.loop import fit
from artspeech_tpu.train.pc_step import (
    make_latent_rnn_eval_step,
    make_latent_rnn_train_step,
)
from artspeech_tpu.train.state import count_parameters, create_train_state
from artspeech_tpu.utils.io import sequences_from_dict


def build_frozen_ae(cfg, indices_dict, articulators, require_encoder=True):
    """Frozen encoder/decoder closures over loaded parameter pytrees.

    The encoder is optional ONLY for synthesis-time callers: those configs
    ship just the decoder (reference
    generate_vocal_tract_shape_autoencoder.yaml carries only
    ``aux_state_dict_filepath`` = best_decoders.pt), and they pass
    ``require_encoder=False`` to get ``encode_fn=None``. Training callers
    need the encoder for the composite loss, so a missing
    ``encoder_state_dict_filepath`` raises here — at config-read time —
    instead of surfacing later as "'NoneType' object is not callable"
    inside the jitted loss.
    """
    from artspeech_tpu.models.autoencoder import latent_size_of

    in_features = cfg.get("in_features", 100)
    hidden = cfg.get("hidden_features", 50)
    sample = jnp.zeros((1, len(articulators), in_features))
    encode_fn = None
    if require_encoder and not cfg.get("encoder_state_dict_filepath"):
        raise KeyError(
            "encoder_state_dict_filepath is required for training "
            "(decoder-only configs are only valid for synthesis callers)"
        )
    if cfg.get("encoder_state_dict_filepath"):
        encoder = MultiEncoder(
            indices_dict=indices_dict,
            in_features=in_features,
            hidden_features=hidden,
            encoder_cls=cfg.get("encoder_cls", "AE"),
        )
        enc_template = encoder.init(jax.random.PRNGKey(0), sample)["params"]
        enc_params = load_params(cfg["encoder_state_dict_filepath"], enc_template)

        def encode_fn(x):
            return jnp.tanh(encoder.apply({"params": enc_params}, x))

    decoder = MultiDecoder(
        indices_dict=indices_dict,
        in_features=in_features,
        hidden_features=hidden,
        decoder_cls=cfg.get("decoder_cls", "AE"),
    )
    z = jnp.zeros((1, latent_size_of(indices_dict)))
    dec_template = decoder.init(jax.random.PRNGKey(0), z)["params"]
    dec_params = load_params(cfg["decoder_state_dict_filepath"], dec_template)

    def decode_fn(zz):
        return decoder.apply({"params": dec_params}, zz)

    return encode_fn, decode_fn


def build_frozen_recognizer(cfg, vocabulary):
    rec_cfg = cfg.get("recognizer")
    if not rec_cfg:
        return None
    model = DeepSpeech2(
        num_classes=len(vocabulary), **(rec_cfg.get("model_params") or {})
    )
    d = rec_cfg.get("model_params", {}).get("num_features", 500)
    c = rec_cfg.get("model_params", {}).get("in_channels", 2)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, c, d, 8))
    )["params"]
    params = load_params(rec_cfg["state_dict_filepath"], template)

    def recognizer_fn(shapes, voicing):
        _, features = model.apply(
            {"params": params}, shapes, voicing=voicing, return_features=True
        )
        return features

    return recognizer_fn


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    to_mm = mm_per_unit(DATASET_CONFIG[database_name])
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    indices_dict = normalize_indices_dict(cfg["indices_dict"])
    articulators = sorted(indices_dict.keys())
    datadir = cfg["datadir"]

    norm_stats = load_norm_stats(datadir, articulators)
    denorm_mean, denorm_std = stack_norm_stats(norm_stats, articulators)

    loaders = {}
    for split, key, shuffle in (
        ("train", "train_seq_dict", True),
        ("valid", "valid_seq_dict", False),
        ("test", "test_seq_dict", False),
    ):
        dataset = PrincipalComponentsDataset(
            datadir,
            database_name,
            sequences_from_dict(datadir, cfg[key]),
            vocabulary,
            articulators,
            TV_to_phoneme_map=cfg.get("TV_to_phoneme_map"),
            clip_tails=cfg.get("clip_tails", True),
            norm_stats=norm_stats,
        )
        loaders[split] = BucketedLoader(
            dataset,
            batch_size=cfg["batch_size"],
            shuffle=shuffle,
            # dp-shardable batch dim; fit() builds the mesh (see train/loop.py)
            pad_to_multiple=len(jax.devices()),
        )

    encode_fn, decode_fn = build_frozen_ae(cfg, indices_dict, articulators)
    recognizer_fn = build_frozen_recognizer(cfg, vocabulary)
    tvs = sorted((cfg.get("TV_to_phoneme_map") or {}).keys())
    rescale = cfg.get("rescale_factor", 1.0)
    loss_fn = make_autoencoder_loss(
        encode_fn,
        decode_fn,
        tvs,
        articulators,
        beta1=cfg.get("beta1", 1.0),
        beta2=cfg.get("beta2", 1.0),
        beta3=cfg.get("beta3", 1.0),
        beta4=cfg.get("beta4", 0.0),
        rescale_factor=rescale,
        denorm_mean=jnp.asarray(denorm_mean),
        denorm_std=jnp.asarray(denorm_std),
        recognizer_fn=recognizer_fn,
    )

    model = PrincipalComponentsArtSpeech(
        vocab_size=len(vocabulary),
        indices_dict=indices_dict,
        **(cfg.get("model_kwargs") or {}),
    )
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    state = create_train_state(
        model,
        rng,
        (jnp.zeros((2, 8), jnp.int32), jnp.full((2,), 8, jnp.int32)),
        learning_rate=cfg["learning_rate"],
        weight_decay=cfg.get("weight_decay", 0.0),
    )
    tracker.log_params({"num_network_params": count_parameters(state.params)})

    result = fit(
        state,
        loaders["train"],
        loaders["valid"],
        make_latent_rnn_train_step(
            model, loss_fn, decode_fn, denorm_mean, denorm_std, to_mm, rescale
        ),
        make_latent_rnn_eval_step(
            model, loss_fn, decode_fn, denorm_mean, denorm_std, to_mm, rescale
        ),
        n_epochs=cfg["num_epochs"],
        checkpoints_dir=os.path.join(args.output_dir, "checkpoints"),
        monitor="p2cp_mm",
        patience=cfg.get("patience", 30),
        tracker=tracker,
        seed=cfg.get("seed", 0),
        resume=args.checkpoint_filepath is not None,
        resume_from=args.checkpoint_filepath,
    )

    best_state, _ = restore_checkpoint(result.best_params_dir, result.state)

    def apply_fn(params, tokens, lengths):
        return model.apply({"params": params}, tokens, lengths)

    info = run_latent_rnn_test(
        best_state,
        apply_fn,
        decode_fn,
        loaders["test"],
        articulators,
        denorm_mean,
        denorm_std,
        to_mm,
        rescale_factor=rescale,
        outputs_dir=os.path.join(args.output_dir, "test_outputs", "0"),
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps({"p2cp_mm": info["p2cp_mm"]}, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Train phoneme-to-principal-components", main)
