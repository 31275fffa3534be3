"""Jitted train/eval steps for the autoencoder / principal-components method.

Covers the two trainers of the reference:
- the frame autoencoder (train_principal_components_autoencoder.py:67-356,
  RegularizedLatentsMSELoss2, best metric = reconstruction p2cp_mm), and
- the latent sequence model (train_phoneme_to_principal_components.py:58-471,
  AutoencoderLoss2 composite with frozen AE + optional frozen recognizer,
  valid metric DecoderMeanP2CPDistance2),
each as one compiled XLA program.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from artspeech_tpu.ops.rng import as_rbg_key
from artspeech_tpu.losses.autoencoder import (
    decoder_mean_p2cp_mm,
    make_autoencoder_loss,
    regularized_latents_mse_loss,
)
from artspeech_tpu.ops.distances import mean_p2cp_channel_major


def reconstruction_p2cp_mm(recon, targets, denorm_mean, denorm_std, to_mm, weights=None):
    """AE reconstruction error in mm (reference
    train_principal_components_autoencoder.py:40-64 ``reconstruction_error``).

    Args:
        recon/targets: (B, Nart, 2 * n_samples) normalized flat contours.
        weights: optional (B,) sample weights; zero-weight rows (bucket
            padding, whose p2cp is trivially 0) are excluded from the mean.
    """
    b, n_art, flat = recon.shape
    n_samples = flat // 2
    r = recon.reshape(b, n_art, 2, n_samples) * denorm_std + denorm_mean
    t = targets.reshape(b, n_art, 2, n_samples) * denorm_std + denorm_mean
    p2cp = mean_p2cp_channel_major(r, t)  # (B, Nart)
    if weights is None:
        return jnp.mean(p2cp) * to_mm
    valid = (weights > 0).astype(p2cp.dtype)
    return (
        jnp.sum(p2cp * valid[:, None])
        / jnp.maximum(jnp.sum(valid) * n_art, 1.0)
        * to_mm
    )


def make_autoencoder_train_step(
    model,
    indices_dict: Dict,
    alpha: float,
    denorm_mean,
    denorm_std,
    to_mm: float,
    donate: bool = True,
    with_p2cp: bool = False,
):
    """Frame AE training step over {inputs (B, Nart, F), weights (B,)}.

    ``with_p2cp`` adds the reconstruction-P2CP metric to the train step.
    Off by default: the reference computes fn_metrics only in the VALID
    phase (train_principal_components_autoencoder.py:200-226 passes
    ``fn_metrics`` to the valid run_autoencoder_epoch only); model
    selection uses the valid epoch's p2cp_mm either way."""

    def train_step(state, batch):
        def loss_fn(params):
            recon, latents = state.apply_fn({"params": params}, batch["inputs"])
            loss = regularized_latents_mse_loss(
                recon,
                latents,
                batch["inputs"],
                indices_dict,
                alpha,
                sample_weights=batch["weights"],
            )
            return loss, recon

        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        if with_p2cp:
            metrics["p2cp_mm"] = reconstruction_p2cp_mm(
                recon, batch["inputs"], denorm_mean, denorm_std, to_mm,
                weights=batch["weights"],
            )
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_autoencoder_eval_step(
    model, indices_dict: Dict, alpha: float, denorm_mean, denorm_std, to_mm: float
):
    def eval_step(state, batch):
        recon, latents = state.apply_fn({"params": state.params}, batch["inputs"])
        loss = regularized_latents_mse_loss(
            recon, latents, batch["inputs"], indices_dict, alpha,
            sample_weights=batch["weights"],
        )
        metrics = {
            "loss": loss,
            "p2cp_mm": reconstruction_p2cp_mm(
                recon, batch["inputs"], denorm_mean, denorm_std, to_mm,
                weights=batch["weights"],
            ),
        }
        return metrics, (recon, latents)

    return jax.jit(eval_step)


def make_latent_rnn_train_step(
    rnn_model,
    loss_fn: Callable,
    decode_fn: Callable,
    denorm_mean,
    denorm_std,
    to_mm: float,
    rescale_factor: float = 1.0,
    donate: bool = True,
    with_p2cp: bool = False,
):
    """Latent-RNN training step; ``loss_fn`` from make_autoencoder_loss.

    ``with_p2cp`` adds the decoded-contour P2CP metric (an extra frozen-AE
    decode of every frame) to the train step. Off by default: the reference
    computes DecoderMeanP2CPDistance2 only in the VALID phase
    (train_phoneme_to_principal_components.py:360-380)."""

    def train_step(state, batch, dropout_rng):
        def inner(params):
            pcs = state.apply_fn(
                {"params": params},
                batch["tokens"],
                batch["lengths"],
                deterministic=False,
                rngs={"dropout": as_rbg_key(dropout_rng)},
            )
            loss = loss_fn(
                pcs,
                batch["targets"],
                batch["references"],
                batch["lengths"],
                batch["critical_masks"],
                voicing=batch.get("voicing"),
            )
            return loss, pcs

        (loss, pcs), grads = jax.value_and_grad(inner, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        if with_p2cp:
            metrics["p2cp_mm"] = decoder_mean_p2cp_mm(
                pcs,
                batch["targets"],
                batch["lengths"],
                decode_fn,
                denorm_mean,
                denorm_std,
                to_mm,
                rescale_factor=rescale_factor,
            )
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_latent_rnn_eval_step(
    rnn_model,
    loss_fn: Callable,
    decode_fn: Callable,
    denorm_mean,
    denorm_std,
    to_mm: float,
    rescale_factor: float = 1.0,
):
    def eval_step(state, batch):
        pcs = state.apply_fn(
            {"params": state.params}, batch["tokens"], batch["lengths"]
        )
        loss = loss_fn(
            pcs,
            batch["targets"],
            batch["references"],
            batch["lengths"],
            batch["critical_masks"],
            voicing=batch.get("voicing"),
        )
        metrics = {
            "loss": loss,
            "p2cp_mm": decoder_mean_p2cp_mm(
                pcs,
                batch["targets"],
                batch["lengths"],
                decode_fn,
                denorm_mean,
                denorm_std,
                to_mm,
                rescale_factor=rescale_factor,
            ),
        }
        return metrics, pcs

    return jax.jit(eval_step)
