"""Losses and metrics for phoneme-to-articulation models.

Equivalents of reference encoder_decoder/{loss.py, metrics.py} and the masked
reduction done inline in train_phoneme_to_articulation.py:85-90, expressed as
pure jit-safe functions (no host loops: the per-sentence mean over valid
frames is a masked segment mean).
"""

from typing import Optional

import jax.numpy as jnp

from artspeech_tpu.core.config import DatasetConfig, mm_per_unit
from artspeech_tpu.ops.distances import (
    euclidean_distance,
    mean_p2cp_channel_major,
)
from artspeech_tpu.utils.masks import make_padding_mask


def masked_euclidean_loss(outputs, targets, lengths):
    """Mean per-point Euclidean distance over valid frames.

    Args:
        outputs, targets: (B, T, Nart, 2, D).
        lengths: (B,) valid frame counts.
    Returns:
        scalar loss. Equivalent of reference
        train_phoneme_to_articulation.py:85-90 (EuclideanDistance with
        reduction "none", masked view, then .mean()).
    """
    dist = euclidean_distance(outputs, targets)  # (B, T, Nart, D)
    mask = make_padding_mask(lengths, outputs.shape[1])  # (B, T)
    w = mask[:, :, None, None].astype(dist.dtype)
    # Number of valid (frame, articulator, point) cells.
    n_valid = jnp.maximum(jnp.sum(mask), 1.0) * dist.shape[2] * dist.shape[3]
    return jnp.sum(dist * w) / n_valid


def p2cp_distance_mm(
    outputs,
    targets,
    lengths,
    dataset_config: Optional[DatasetConfig] = None,
    to_mm: Optional[float] = None,
    reduce: bool = True,
):
    """Mean P2CP distance in millimetres, masked per sentence.

    Equivalent of reference encoder_decoder/metrics.py:7-26: P2CP per
    (frame, articulator), converted to mm, averaged over valid frames per
    sentence, then averaged over the batch.

    Args:
        outputs, targets: (B, T, Nart, 2, D).
        lengths: (B,).
        reduce: if False, return ``(per_sentence, valid)`` (both (B,))
            instead of the batch mean — for callers that aggregate across
            shards with uneven valid-sentence counts (train/step.py).
    """
    if to_mm is None:
        to_mm = mm_per_unit(dataset_config) if dataset_config is not None else 1.0
    # Transpose-free on the (B, T, Nart, 2, D) model layout.
    p2cp = mean_p2cp_channel_major(outputs, targets)  # (B, T, Nart)
    p2cp_mm = p2cp * to_mm
    mask = make_padding_mask(lengths, outputs.shape[1]).astype(p2cp.dtype)
    per_sentence = jnp.sum(p2cp_mm * mask[:, :, None], axis=(1, 2)) / (
        jnp.maximum(lengths.astype(p2cp.dtype), 1.0) * p2cp.shape[2]
    )
    # Zero-length dummy rows (bucket padding) must not dilute the batch mean.
    valid = (lengths > 0).astype(p2cp.dtype)
    if not reduce:
        return per_sentence * valid, valid
    return jnp.sum(per_sentence * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def euclidean_distance_mm(outputs, targets, lengths, to_mm: float):
    """Masked mean Euclidean distance (MED) in mm: per-sentence mean over
    valid frames, then mean over real sentences — the reference run_test
    aggregation (one per-sentence value appended per batch element,
    encoder_decoder/evaluation.py:68-84,148-157)."""
    dist = euclidean_distance(outputs, targets)  # (B, T, Nart, D)
    mask = make_padding_mask(lengths, outputs.shape[1]).astype(dist.dtype)
    per_sentence = jnp.sum(
        jnp.mean(dist, axis=-1) * mask[:, :, None], axis=(1, 2)
    ) / (jnp.maximum(lengths.astype(dist.dtype), 1.0) * dist.shape[2])
    valid = (lengths > 0).astype(dist.dtype)
    return jnp.sum(per_sentence * valid) / jnp.maximum(jnp.sum(valid), 1.0) * to_mm


def recognition_feature_loss(output_features, target_features, lengths):
    """MSE between recognizer features of outputs vs targets, pad-masked.

    The deep perceptual supervision term of reference
    encoder_decoder/loss.py:6-37 (``ArtSpeechLoss``).
    Args:
        output_features, target_features: (B, T, F).
        lengths: (B,).
    """
    mask = make_padding_mask(lengths, output_features.shape[1])
    sq = (output_features - target_features) ** 2
    w = mask[:, :, None].astype(sq.dtype)
    n_valid = jnp.maximum(jnp.sum(mask), 1.0) * sq.shape[-1]
    return jnp.sum(sq * w) / n_valid
