"""Recognition losses: CTC and padded cross-entropy.

Equivalents of reference phoneme_recognition/metrics.py:87-121
(``CrossEntropyLoss`` with per-class weights over pad-masked flattened
frames) and ``nn.CTCLoss(zero_infinity=True)`` as used in
train_phoneme_recognition.py:96-101 — expressed as pure jit-safe functions
(optax.ctc_loss for the CTC forward-backward; masking instead of flattening
+ boolean indexing, which would be shape-dynamic under jit).
"""

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artspeech_tpu.utils.masks import make_padding_mask


def ctc_loss(log_probs, targets, input_lengths, target_lengths, blank_id: int = 0):
    """Mean CTC loss over the batch.

    Args:
        log_probs: (B, T, K) log probabilities.
        targets: (B, N) label ids (padding value irrelevant, masked below).
        input_lengths: (B,); target_lengths: (B,).
    ``zero_infinity=True`` semantics: sentences whose loss is non-finite
    (target longer than input) contribute 0.
    """
    t = log_probs.shape[1]
    n = targets.shape[1]
    logit_paddings = 1.0 - make_padding_mask(input_lengths, t).astype(log_probs.dtype)
    label_paddings = 1.0 - make_padding_mask(target_lengths, n).astype(log_probs.dtype)
    per_seq = optax.ctc_loss(
        log_probs,
        logit_paddings,
        jnp.maximum(targets, 0),
        label_paddings,
        blank_id=blank_id,
    )
    # Match torch's reduction="mean" + zero_infinity: per-sequence loss
    # divided by target length, non-finite losses zeroed but still counted,
    # averaged over REAL sequences (zero-length bucket-padding dummies are
    # excluded from the denominator).
    per_seq = per_seq / jnp.maximum(target_lengths.astype(per_seq.dtype), 1.0)
    valid = (target_lengths > 0).astype(per_seq.dtype)
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0) * valid
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(valid), 1.0)


def ctc_loss_parts(log_probs, targets, input_lengths, target_lengths,
                   blank_id: int = 0):
    """Numerator/denominator split of :func:`ctc_loss` — ``(sum of
    per-sequence normalized losses, valid-sequence count)``. Summing the
    parts over microbatches and dividing once reproduces the full-batch
    mean EXACTLY (the denominator depends only on ``target_lengths``), which
    is what the accumulated recognition train step needs."""
    t = log_probs.shape[1]
    n = targets.shape[1]
    logit_paddings = 1.0 - make_padding_mask(input_lengths, t).astype(log_probs.dtype)
    label_paddings = 1.0 - make_padding_mask(target_lengths, n).astype(log_probs.dtype)
    per_seq = optax.ctc_loss(
        log_probs,
        logit_paddings,
        jnp.maximum(targets, 0),
        label_paddings,
        blank_id=blank_id,
    )
    per_seq = per_seq / jnp.maximum(target_lengths.astype(per_seq.dtype), 1.0)
    valid = (target_lengths > 0).astype(per_seq.dtype)
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0) * valid
    return jnp.sum(per_seq), jnp.sum(valid)


def load_class_weights(filepath: str, vocabulary) -> jnp.ndarray:
    """Per-class CE weights from a {token: weight} JSON, aligned to the
    ACTUAL vocabulary ids (reference metrics.py:94-105 prepends 1.0 and
    relies on its CE vocab being [UNKNOWN]+sorted(tokens); this repo's
    vocabularies put BLANK at 0 and UNKNOWN at 1, so positional alignment
    would shift every weight by one class). Tokens absent from the JSON
    (including BLANK/UNKNOWN) weigh 1.0.

    Args:
        vocabulary: token -> id mapping (or an int class count for an
            all-ones vector).
    """
    with open(filepath) as f:
        class_weights = json.load(f)
    if isinstance(vocabulary, int):
        return jnp.ones((vocabulary,), jnp.float32)
    weights = np.ones((max(vocabulary.values()) + 1,), np.float32)
    for token, w in class_weights.items():
        if token in vocabulary:
            weights[vocabulary[token]] = float(w)
    return jnp.asarray(weights)


def cross_entropy_loss(
    logits,
    targets,
    input_lengths,
    target_lengths=None,
    class_weights: Optional[jnp.ndarray] = None,
):
    """Pad-masked frame-level CE (frame-aligned targets, same T as inputs).

    Args:
        logits: (B, T, K) UNnormalized logits.
        targets: (B, T) int ids (padding masked via input_lengths).
    """
    t = logits.shape[1]
    mask = make_padding_mask(input_lengths, t).astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (B, T)
    if class_weights is not None:
        w = class_weights[tgt] * mask
    else:
        w = mask
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy_loss_parts(
    logits,
    targets,
    input_lengths,
    target_lengths=None,
    class_weights: Optional[jnp.ndarray] = None,
):
    """Numerator/denominator split of :func:`cross_entropy_loss` —
    ``(weighted NLL sum, weight sum)`` for exact microbatched accumulation
    (the weight sum depends only on lengths and targets, not on params)."""
    t = logits.shape[1]
    mask = make_padding_mask(input_lengths, t).astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (B, T)
    if class_weights is not None:
        w = class_weights[tgt] * mask
    else:
        w = mask
    return jnp.sum(nll * w), jnp.sum(w)
