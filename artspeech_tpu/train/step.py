"""Jitted train/eval steps for the phoneme-to-articulation models.

The whole step (forward, masked loss, backward, optimizer update) is one
compiled XLA program; with a (data, model) mesh the batch is sharded over
``data`` and stacked articulator-head parameters over ``model`` (see
artspeech_tpu.parallel.mesh). Equivalent role to reference
train_phoneme_to_articulation.py:45-121, minus the host round trips.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from artspeech_tpu.losses.articulation import (
    masked_euclidean_loss,
    p2cp_distance_mm,
)


def make_artspeech_train_step(to_mm: float, donate: bool = True):
    """Build the jitted training step for ArtSpeech-family models.

    Batch layout: dict with ``tokens`` (B, T), ``targets`` (B, T, Nart, 2, D),
    ``lengths`` (B,).
    """

    def train_step(state, batch, dropout_rng):
        def loss_fn(params):
            outputs = state.apply_fn(
                {"params": params},
                batch["tokens"],
                batch["lengths"],
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            loss = masked_euclidean_loss(outputs, batch["targets"], batch["lengths"])
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": loss,
            "p2cp_mm": p2cp_distance_mm(
                outputs, batch["targets"], batch["lengths"], to_mm=to_mm
            ),
        }
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_artspeech_eval_step(to_mm: float):
    def eval_step(state, batch):
        outputs = state.apply_fn(
            {"params": state.params},
            batch["tokens"],
            batch["lengths"],
            deterministic=True,
        )
        loss = masked_euclidean_loss(outputs, batch["targets"], batch["lengths"])
        metrics = {
            "loss": loss,
            "p2cp_mm": p2cp_distance_mm(
                outputs, batch["targets"], batch["lengths"], to_mm=to_mm
            ),
        }
        return metrics, outputs

    return jax.jit(eval_step)
