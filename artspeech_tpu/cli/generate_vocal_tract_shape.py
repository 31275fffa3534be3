"""Generate a synthetic articulation corpus from TextGrid phoneme sequences.

Equivalent of reference generate_vocal_tract_shape_v2.py:270-450: pick a
method (encoder_decoder | mean_contour), run the fused synthesis pipeline and
write inference_contours / air_column / xarticul / target_sequence.txt per
sentence — the corpus later consumed by the phoneme-recognition evaluation.

Usage: python -m artspeech_tpu.cli.generate_vocal_tract_shape \
           --config config.yaml
"""

import os

import jax
import jax.numpy as jnp

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.models.artspeech_rnn import ArtSpeech
from artspeech_tpu.models.mean_contour import (
    MeanContourTable,
    make_mean_contour_forward,
)
from artspeech_tpu.synth.pipeline import SynthesisDataset, synthesize_corpus
from artspeech_tpu.train.checkpoint import load_params
from artspeech_tpu.utils.io import sequences_from_dict

def build_forward(cfg, vocabulary, articulators):
    method = cfg.get("method", "encoder_decoder")
    if method == "encoder_decoder":
        model = ArtSpeech(
            vocab_size=len(vocabulary),
            n_articulators=len(articulators),
            **(cfg.get("model_params") or {}),
        )
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32),
            jnp.full((1,), 8, jnp.int32),
        )["params"]
        params = load_params(cfg["state_dict_filepath"], template)

        def forward(tokens, lengths):
            return model.apply({"params": params}, tokens, lengths)

        return forward
    if method == "mean_contour":
        table = MeanContourTable.load(cfg["state_dict_filepath"])
        return make_mean_contour_forward(table)
    if method == "autoencoder":
        # Latent RNN -> frozen decoder -> denorm (reference v2:331-350).
        from artspeech_tpu.cli.train_phoneme_to_principal_components import (
            build_frozen_ae,
        )
        from artspeech_tpu.data.pc_datasets import load_norm_stats, stack_norm_stats
        from artspeech_tpu.models.autoencoder import normalize_indices_dict
        from artspeech_tpu.models.latent_rnn import PrincipalComponentsArtSpeech

        indices_dict = normalize_indices_dict(cfg["indices_dict"])
        arts = sorted(indices_dict.keys())
        norm_stats = load_norm_stats(cfg["norm_stats_dir"] if cfg.get("norm_stats_dir")
                                     else cfg["datadir"], arts)
        denorm_mean, denorm_std = stack_norm_stats(norm_stats, arts)
        # aux_model_params carries the frozen-AE dims (reference
        # generate_vocal_tract_shape_autoencoder.yaml aux_model_params).
        ae_cfg = {**cfg, **(cfg.get("aux_model_params") or {})}
        _, decode_fn = build_frozen_ae(ae_cfg, indices_dict, arts, require_encoder=False)
        rnn = PrincipalComponentsArtSpeech(
            vocab_size=len(vocabulary),
            indices_dict=indices_dict,
            **(cfg.get("model_params") or {}),
        )
        template = rnn.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32),
            jnp.full((1,), 8, jnp.int32),
        )["params"]
        rnn_params = load_params(cfg["state_dict_filepath"], template)
        from artspeech_tpu.models.latent_rnn import make_latent_rnn_synthesis_forward

        return make_latent_rnn_synthesis_forward(
            rnn,
            rnn_params,
            None,
            None,
            jnp.asarray(denorm_mean),
            jnp.asarray(denorm_std),
            rescale_factor=cfg.get("rescale_factor", 1.0),
            decode_fn=decode_fn,
        )
    raise ValueError(f"Unknown synthesis method: {method}")

def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    articulators = sorted(cfg["articulators"])

    dataset = SynthesisDataset(
        cfg["datadir"],
        database_name,
        sequences_from_dict(cfg["datadir"], cfg["seq_dict"]),
        vocabulary,
        articulators,
    )
    forward = build_forward(cfg, vocabulary, articulators)
    written = synthesize_corpus(
        forward,
        dataset,
        cfg["save_to"],
        DATASET_CONFIG[database_name],
        regularize_outputs=cfg.get("regularize_outputs", True),
        batch_size=cfg.get("batch_size", 8),
    )

    # Optional per-sentence plots + .avi videos (reference
    # generate_vocal_tract_shape.py:80-164 / _v2:404-417).
    if cfg.get("save_plots", False) or cfg.get("save_videos", False):

        import numpy as np

        from artspeech_tpu.core.constants import UPPER_INCISOR
        from artspeech_tpu.synth.viz import (
            make_vocal_tract_shape_video,
            save_vocal_tract_shapes,
        )

        full_arts = sorted(set(articulators) | {UPPER_INCISOR})
        framerate = DATASET_CONFIG[database_name].FRAMERATE
        for sentence_dir in written:
            with open(os.path.join(sentence_dir, "target_sequence.txt")) as f:
                phonemes = f.read().split()
            frames = []
            for t in range(len(phonemes)):
                frame_id = f"{t + 1:04d}"
                arrs = [
                    np.load(
                        os.path.join(
                            sentence_dir, "inference_contours", f"{frame_id}_{a}.npy"
                        )
                    )
                    for a in full_arts
                ]
                frames.append(np.stack(arrs))
            outputs = np.stack(frames)  # (T, Nart, 2, D)
            if cfg.get("save_plots", False):
                save_vocal_tract_shapes(
                    full_arts,
                    outputs,
                    phonemes,
                    os.path.join(sentence_dir, "vocal_tract_shapes"),
                )
            if cfg.get("save_videos", False):
                make_vocal_tract_shape_video(
                    full_arts,
                    outputs,
                    phonemes,
                    os.path.join(
                        sentence_dir, os.path.basename(sentence_dir) + ".avi"
                    ),
                    framerate=framerate,
                )

    print(f"Synthesized {len(written)} sentences -> {cfg['save_to']}")
    return written

if __name__ == "__main__":
    run_experiment("Generate vocal tract shapes", main)
