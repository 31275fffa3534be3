"""Evaluate a trained frame autoencoder: reconstruction errors, latent
covariance, nomograms, latent histograms.

Equivalent of reference test_principal_components_autoencoder.py:32-321.

Usage: python -m artspeech_tpu.cli.test_principal_components_autoencoder \
           --config cfg.yaml
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.data.pc_datasets import (
    AutoencoderDataset,
    load_norm_stats,
    stack_norm_stats,
)
from artspeech_tpu.eval.autoencoder import nomograms, run_autoencoder_test
from artspeech_tpu.models.autoencoder import (
    MultiArticulatorAutoencoder,
    latent_size_of,
    normalize_indices_dict,
)
from artspeech_tpu.train.checkpoint import load_params
from artspeech_tpu.train.pc_step import make_autoencoder_eval_step
from artspeech_tpu.train.state import TrainState
from artspeech_tpu.utils.io import sequences_from_dict

import optax


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    to_mm = mm_per_unit(DATASET_CONFIG[database_name])
    indices_dict = normalize_indices_dict(cfg["indices_dict"])
    articulators = sorted(indices_dict.keys())
    datadir = cfg["datadir"]

    norm_stats = load_norm_stats(datadir, articulators)
    denorm_mean, denorm_std = stack_norm_stats(norm_stats, articulators)

    dataset = AutoencoderDataset(
        datadir,
        database_name,
        sequences_from_dict(datadir, cfg["test_seq_dict"]),
        articulators,
        clip_tails=cfg.get("clip_tails", True),
        norm_stats=norm_stats,
    )

    model = MultiArticulatorAutoencoder(
        indices_dict=indices_dict,
        in_features=cfg.get("in_features", 100),
        hidden_features=cfg.get("hidden_features", 50),
        encoder_cls=cfg.get("encoder_cls", "AE"),
        decoder_cls=cfg.get("decoder_cls", "AE"),
    )
    sample = jnp.zeros((1, len(articulators), cfg.get("in_features", 100)))
    template = model.init(jax.random.PRNGKey(0), sample)["params"]
    params = load_params(cfg["checkpoint_dir"], template)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())

    eval_step = make_autoencoder_eval_step(
        model, indices_dict, cfg.get("alpha", 0.1), jnp.asarray(denorm_mean),
        jnp.asarray(denorm_std), to_mm,
    )
    outputs_dir = os.path.join(args.output_dir, "test_outputs")
    info = run_autoencoder_test(
        state,
        eval_step,
        dataset,
        cfg.get("batch_size", 64),
        denorm_mean,
        denorm_std,
        to_mm,
        articulators,
        outputs_dir=outputs_dir,
    )

    def decode_fn(z):
        return model.apply(
            {"params": state.params}, z, method=MultiArticulatorAutoencoder.decode
        )

    noms = nomograms(
        jax.jit(decode_fn),
        latent_size_of(indices_dict),
        indices_dict,
        denorm_mean,
        denorm_std,
    )
    np.savez(
        os.path.join(outputs_dir, "nomograms.npz"),
        **{f"component_{i}": v for i, v in noms.items()},
    )
    _plot_nomograms(noms, articulators, outputs_dir)

    # Latent histograms (reference :230-260): reuse dumped latents.
    latents = np.load(os.path.join(outputs_dir, "latents.npy"))
    hist = {
        f"component_{i}": np.histogram(latents[:, i], bins=20, range=(-1, 1))[0]
        for i in range(latents.shape[1])
    }
    np.savez(os.path.join(outputs_dir, "latent_histograms.npz"), **hist)

    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


def _plot_nomograms(noms, articulators, outputs_dir):
    """Per-component contour sweep figures (reference
    test_principal_components_autoencoder.py nomogram plots)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    from artspeech_tpu.core.constants import COLORS

    plots_dir = os.path.join(outputs_dir, "nomograms")
    os.makedirs(plots_dir, exist_ok=True)
    arts = sorted(articulators)
    for comp, sweep in noms.items():
        fig, ax = plt.subplots(figsize=(6, 6))
        k = sweep.shape[0]
        for s_idx in range(k):
            alpha = 0.25 + 0.75 * s_idx / max(k - 1, 1)
            for i, art in enumerate(arts):
                ax.plot(
                    sweep[s_idx, i, 0],
                    sweep[s_idx, i, 1],
                    color=COLORS.get(art, "black"),
                    alpha=alpha,
                    linewidth=1,
                )
        ax.invert_yaxis()
        ax.axis("off")
        ax.set_title(f"component {comp}")
        fig.savefig(os.path.join(plots_dir, f"component_{comp}.jpg"), dpi=100)
        plt.close(fig)


if __name__ == "__main__":
    run_experiment("Test principal-components autoencoder", main)
