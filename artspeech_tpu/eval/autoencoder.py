"""Evaluation harnesses for the autoencoder / principal-components method.

Equivalents of reference principal_components/evaluation.py:106-443
(``run_multiart_autoencoder_test``, ``run_phoneme_to_principal_components_test``)
and the nomogram/latent-histogram analysis of
test_principal_components_autoencoder.py:32-321.
"""

import json
import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.core.constants import (
    REQUIRED_ARTICULATORS_FOR_TVS,
    UPPER_INCISOR,
)
from artspeech_tpu.eval.articulation import (
    inject_upper_incisor,
    per_sentence_metrics,
)
from artspeech_tpu.eval.artifacts import (
    save_contours,
    save_tract_variables_csv,
    tvs_to_records,
)
from artspeech_tpu.geometry.tract_variables import tract_variables_from_stack
from artspeech_tpu.ops.distances import mean_p2cp_channel_major
from artspeech_tpu.train.pc_step import reconstruction_p2cp_mm


def run_autoencoder_test(
    state,
    eval_step,
    dataset,
    batch_size: int,
    denorm_mean,
    denorm_std,
    to_mm: float,
    articulators: Sequence[str],
    outputs_dir: Optional[str] = None,
    n_samples: int = 50,
) -> Dict:
    """Frame-AE test: per-articulator reconstruction p2cp_mm + latent
    covariance matrix (reference evaluation.py:106-280)."""
    arts = sorted(articulators)
    losses, all_latents = [], []
    per_art_p2cp = []
    for batch, meta in dataset.batches(batch_size, shuffle=False):
        metrics, (recon, latents) = eval_step(state, batch)
        n = meta["n_valid"]
        losses.append(float(metrics["loss"]))
        recon = np.asarray(recon)[:n]
        latents = np.asarray(latents)[:n]
        inputs = np.asarray(batch["inputs"])[:n]
        all_latents.append(latents)

        b = recon.shape[0]
        r = recon.reshape(b, len(arts), 2, n_samples) * np.asarray(denorm_std) + np.asarray(denorm_mean)
        t = inputs.reshape(b, len(arts), 2, n_samples) * np.asarray(denorm_std) + np.asarray(denorm_mean)
        p2cp = np.asarray(
            mean_p2cp_channel_major(jnp.asarray(r), jnp.asarray(t))
        )  # (B, Nart)
        per_art_p2cp.append(p2cp * to_mm)

    latents = np.concatenate(all_latents, axis=0)
    p2cp_mm = np.concatenate(per_art_p2cp, axis=0)
    info = {
        "loss": float(np.mean(losses)),
        "p2cp_mm": float(p2cp_mm.mean()),
    }
    for i, art in enumerate(arts):
        info[art] = {"p2cp_mm": float(p2cp_mm[:, i].mean())}

    if outputs_dir is not None:
        os.makedirs(outputs_dir, exist_ok=True)
        cov = np.cov(latents.T)
        np.save(os.path.join(outputs_dir, "latent_covariance.npy"), cov)
        np.save(os.path.join(outputs_dir, "latents.npy"), latents)
        with open(os.path.join(outputs_dir, "test_results.json"), "w") as f:
            json.dump(info, f, indent=2)
        _maybe_plot_cov(cov, outputs_dir)
    return info


def nomograms(
    decode_fn: Callable,
    latent_size: int,
    indices_dict: Dict[str, Sequence[int]],
    denorm_mean,
    denorm_std,
    sweep=np.linspace(-1.0, 1.0, 9),
) -> Dict[int, np.ndarray]:
    """Per-component decoder sweep: latent i in [-1, 1], others 0
    (reference test_principal_components_autoencoder.py nomogram analysis).

    Returns {component: (len(sweep), Nart, 2, D) denormalized contours} —
    computed in ONE batched decode over all (component, value) pairs.
    """
    k = len(sweep)
    z = np.zeros((latent_size * k, latent_size), np.float32)
    for i in range(latent_size):
        z[i * k : (i + 1) * k, i] = sweep
    shapes = np.asarray(decode_fn(jnp.asarray(z)))  # (L*k, Nart, 2*D)
    n_art = shapes.shape[1]
    n_samples = shapes.shape[2] // 2
    shapes = shapes.reshape(latent_size, k, n_art, 2, n_samples)
    shapes = shapes * np.asarray(denorm_std) + np.asarray(denorm_mean)
    return {i: shapes[i] for i in range(latent_size)}


def run_latent_rnn_test(
    state,
    apply_fn: Callable,
    decode_fn: Callable,
    loader,
    articulators: Sequence[str],
    denorm_mean,
    denorm_std,
    to_mm: float,
    rescale_factor: float = 1.0,
    outputs_dir: Optional[str] = None,
    n_samples: int = 50,
) -> Dict:
    """Latent-RNN test: decode, denorm, inject incisor, per-articulator
    metrics + TV/contour dumps (reference evaluation.py:283-443)."""
    arts = sorted(articulators)
    dmean = jnp.asarray(denorm_mean)
    dstd = jnp.asarray(denorm_std)

    @jax.jit
    def test_step(params, batch):
        pcs = apply_fn(params, batch["tokens"], batch["lengths"])
        b, t = pcs.shape[:2]
        shapes = decode_fn(rescale_factor * pcs).reshape(
            b, t, len(arts), 2, n_samples
        )
        shapes = shapes * dstd + dmean
        targets = batch["targets"] * dstd + dmean
        metrics = per_sentence_metrics(shapes, targets, batch["lengths"])
        merged_out, tv_arts = inject_upper_incisor(
            shapes, batch["references"], arts
        )
        merged_tgt, _ = inject_upper_incisor(targets, batch["references"], arts)
        # TVs only when every required articulator is present (reference
        # principal_components/evaluation.py:404-412).
        tvs_pred = tvs_tgt = {}
        if all(a in tv_arts for a in REQUIRED_ARTICULATORS_FOR_TVS):
            tvs_pred = tract_variables_from_stack(merged_out, tv_arts)
            tvs_tgt = tract_variables_from_stack(merged_tgt, tv_arts)
            tvs_pred = {k: v for k, v in tvs_pred.items() if v is not None}
            tvs_tgt = {k: v for k, v in tvs_tgt.items() if v is not None}
        return {
            "metrics": metrics,
            "outputs": merged_out,
            "targets": merged_tgt,
            "tvs_pred": tvs_pred,
            "tvs_tgt": tvs_tgt,
        }

    tv_articulators = (
        sorted(set(arts) | {UPPER_INCISOR}) if UPPER_INCISOR not in arts else arts
    )
    acc = {k: [] for k in ("p2cp", "med", "x_corr", "y_corr")}
    for batch, meta in loader:
        result = jax.device_get(test_step(state.params, batch))
        lengths = np.asarray(batch["lengths"])
        valid = lengths > 0
        for k in acc:
            acc[k].append(np.asarray(result["metrics"][k])[valid])
        if outputs_dir is not None:
            outputs = np.asarray(result["outputs"])
            targets = np.asarray(result["targets"])
            for i, name in enumerate(meta["sentence_names"]):
                L = int(lengths[i])
                if L == 0:
                    continue
                frame_ids = meta["frame_ids"][i][:L]
                phonemes = meta["phonemes"][i][:L]
                save_contours(
                    name, frame_ids, outputs[i, :L], targets[i, :L],
                    phonemes, tv_articulators, outputs_dir,
                )
                if result["tvs_pred"]:
                    pred_tvs = {
                        k: {kk: np.asarray(vv)[i] for kk, vv in v.items()}
                        for k, v in result["tvs_pred"].items()
                    }
                    tgt_tvs = {
                        k: {kk: np.asarray(vv)[i] for kk, vv in v.items()}
                        for k, v in result["tvs_tgt"].items()
                    }
                    save_tract_variables_csv(
                        name,
                        tvs_to_records(name, frame_ids, phonemes, pred_tvs, tgt_tvs),
                        outputs_dir,
                    )

    stacked = {k: np.concatenate(v, axis=0) for k, v in acc.items()}
    info = {}
    for i, art in enumerate(arts):
        info[art] = {
            "x_corr": float(np.mean(stacked["x_corr"][:, i])),
            "y_corr": float(np.mean(stacked["y_corr"][:, i])),
            "p2cp": float(np.mean(stacked["p2cp"][:, i])),
            "p2cp_mm": float(np.mean(stacked["p2cp"][:, i]) * to_mm),
            "med": float(np.mean(stacked["med"][:, i])),
            "med_mm": float(np.mean(stacked["med"][:, i]) * to_mm),
        }
    info["p2cp_mm"] = float(np.mean(stacked["p2cp"]) * to_mm)
    return info


def _maybe_plot_cov(cov: np.ndarray, outputs_dir: str):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(np.abs(cov), cmap="magma")
    fig.colorbar(im)
    ax.set_title("|latent covariance|")
    fig.savefig(os.path.join(outputs_dir, "latent_covariance.png"), dpi=120)
    plt.close(fig)
