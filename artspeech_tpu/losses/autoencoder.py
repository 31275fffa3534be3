"""Losses for the autoencoder / principal-components method.

Equivalents of reference principal_components/losses.py:
- ``critical_loss``       <- CriticalLoss (losses.py:23-99)
- ``regularized_latents_mse_loss`` <- RegularizedLatentsMSELoss2 (:254-285)
- ``make_autoencoder_loss``        <- AutoencoderLoss2 (:100-251)

TPU-first: the frozen encoder/decoder of AutoencoderLoss2 are plain function
closures over constant parameter pytrees (wrapped in stop_gradient), so the
whole composite loss — frozen AE forward, critical cdist-min, recognizer
features — compiles into the one training program; the reference's
state-dict-loading ``InputTransform`` modules disappear.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from artspeech_tpu.core.constants import (
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE,
    SOFT_PALATE_MIDLINE,
    TONGUE,
    UPPER_INCISOR,
    UPPER_LIP,
)
from artspeech_tpu.ops.distances import min_pairwise_distance_channel_major
from artspeech_tpu.utils.masks import make_padding_mask

#: reference losses.py:24-29. The reference maps VEL to SOFT_PALATE; corpora
#: annotate the midline, so accept either name at lookup time.
TV_TO_ARTICULATOR_MAP = {
    "LA": [LOWER_LIP, UPPER_LIP],
    "TTCD": [TONGUE, UPPER_INCISOR],
    "TBCD": [TONGUE, UPPER_INCISOR],
    "VEL": [SOFT_PALATE, PHARYNX],
}


def _resolve_index(articulator: str, indices: Dict[str, int]) -> int:
    if articulator in indices:
        return indices[articulator]
    if articulator == SOFT_PALATE and SOFT_PALATE_MIDLINE in indices:
        return indices[SOFT_PALATE_MIDLINE]
    raise KeyError(articulator)


def critical_loss(
    output_shapes,
    reference_arrays,
    critical_mask,
    TVs: Sequence[str],
    articulators: Sequence[str],
    denorm_mean=None,
    denorm_std=None,
):
    """Mean minimum TV distance over critical frames.

    Args:
        output_shapes: (B, T, Nart, 2, D) predicted shapes (normalized if
            denorm stats given).
        reference_arrays: (B, T, 1, 2, D) upper-incisor reference.
        critical_mask: (B, Ntv, T) 1 where the frame's phoneme is critical.
        denorm_mean/denorm_std: optional (Nart, 2, D) stats applied before
            measuring distances (reference losses.py:76-88).
    """
    TVs = sorted(TVs)
    if len(TVs) == 0:
        return jnp.asarray(0.0, output_shapes.dtype)

    if denorm_mean is not None:
        output_shapes = output_shapes * denorm_std + denorm_mean

    arts = list(articulators)
    if UPPER_INCISOR not in arts:
        full_arts = sorted(arts + [UPPER_INCISOR])
        ref_idx = full_arts.index(UPPER_INCISOR)
        output_shapes = jnp.concatenate(
            [
                output_shapes[:, :, :ref_idx],
                reference_arrays,
                output_shapes[:, :, ref_idx:],
            ],
            axis=2,
        )
    else:
        full_arts = arts
    indices = {a: i for i, a in enumerate(full_arts)}

    dists = []
    for tv in TVs:
        art1, art2 = TV_TO_ARTICULATOR_MAP[tv]
        a1 = output_shapes[..., _resolve_index(art1, indices), :, :]
        a2 = output_shapes[..., _resolve_index(art2, indices), :, :]
        # Transpose-free fused min over the full pairwise set (B, T).
        dists.append(min_pairwise_distance_channel_major(a1, a2))
    per_tv = jnp.stack(dists, axis=1)  # (B, Ntv, T)
    w = (critical_mask == 1).astype(per_tv.dtype)
    return jnp.sum(per_tv * w) / jnp.maximum(jnp.sum(w), 1.0)


def offdiag_cov_penalty(latents, indices_dict: Dict[str, Sequence[int]], valid=None):
    """Sum over articulator blocks of squared off-diagonal covariance
    entries (reference losses.py:275-283).

    Args:
        valid: optional (B,) 0/1 mask — zero-padded dummy rows from bucket
            batching must not enter the covariance estimate.
    """
    if valid is None:
        n = latents.shape[0]
        centered = latents - jnp.mean(latents, axis=0, keepdims=True)
        cov = centered.T @ centered / jnp.maximum(n - 1, 1)  # (L, L)
    else:
        v = valid.astype(latents.dtype)[:, None]
        n = jnp.maximum(jnp.sum(v), 1.0)
        mean = jnp.sum(latents * v, axis=0, keepdims=True) / n
        centered = (latents - mean) * v
        cov = centered.T @ centered / jnp.maximum(n - 1.0, 1.0)
    total = jnp.asarray(0.0, latents.dtype)
    for _, idx in indices_dict.items():
        if len(idx) <= 1:
            continue
        block = cov[jnp.ix_(jnp.asarray(idx), jnp.asarray(idx))]
        total = total + jnp.sum(block**2) - jnp.sum(jnp.diag(block) ** 2)
    return total


def regularized_latents_mse_loss(
    outputs,
    latents,
    targets,
    indices_dict: Dict[str, Sequence[int]],
    alpha: float,
    sample_weights=None,
):
    """Weighted reconstruction MSE + alpha * off-diagonal latent covariance
    (reference losses.py:254-285).

    Args:
        outputs/targets: (B, Nart, F); latents: (B, L);
        sample_weights: (B,). Zero-weight rows (bucket-padding dummies) are
            excluded from BOTH the MSE denominator and the covariance.
    """
    sq = (outputs - targets) ** 2
    if sample_weights is not None:
        sq = sq * sample_weights[:, None, None]
        valid = (sample_weights > 0).astype(sq.dtype)
        n_rows = jnp.maximum(jnp.sum(valid), 1.0)
        mse = jnp.sum(sq) / (n_rows * sq.shape[1] * sq.shape[2])
        return mse + alpha * offdiag_cov_penalty(latents, indices_dict, valid)
    mse = jnp.mean(sq)
    return mse + alpha * offdiag_cov_penalty(latents, indices_dict)


def make_autoencoder_loss(
    encode_fn: Callable,
    decode_fn: Callable,
    TVs: Sequence[str],
    articulators: Sequence[str],
    beta1: float = 1.0,
    beta2: float = 1.0,
    beta3: float = 1.0,
    beta4: float = 0.0,
    rescale_factor: float = 1.0,
    denorm_mean=None,
    denorm_std=None,
    recognizer_fn: Optional[Callable] = None,
):
    """Composite sequence loss (reference AutoencoderLoss2, losses.py:100-251).

    Args:
        encode_fn: (B*T, Nart, 2*D) -> (B*T, L) FROZEN encoder (tanh'd).
        decode_fn: (B, T, L) -> (B, T, Nart, 2*D) FROZEN decoder.
        recognizer_fn: optional (shapes (B, C, Nart*D, T), voicing) ->
            (B, T, F) features of a FROZEN recognizer.
    Returns loss_fn(output_pcs, target_shapes, reference_arrays, lengths,
                    critical_mask, voicing=None) -> scalar.
    """

    def loss_fn(
        output_pcs,
        target_shapes,
        reference_arrays,
        lengths,
        critical_mask,
        voicing=None,
    ):
        b, t, n_art, _, d = target_shapes.shape
        mask = make_padding_mask(lengths, t).astype(target_shapes.dtype)
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)

        # Frozen-encoder latent targets (stop_gradient: targets, not a path).
        enc_in = target_shapes.reshape(b * t, n_art, 2 * d)
        target_pcs = jax.lax.stop_gradient(encode_fn(enc_in)).reshape(
            b, t, -1
        )

        # Frozen-decoder shapes from predicted latents (grads flow through
        # the decoder INPUT, not its parameters — the closure params are
        # constants).
        output_shapes = decode_fn(rescale_factor * output_pcs)
        output_shapes = output_shapes.reshape(b, t, n_art, 2, d)

        latent_sq = (output_pcs - target_pcs) ** 2  # (B, T, L)
        latent_loss = jnp.sum(
            jnp.mean(latent_sq, axis=-1) * mask
        ) / n_valid

        recon_sq = (output_shapes - target_shapes) ** 2  # (B, T, Nart, 2, D)
        recon_loss = jnp.sum(
            jnp.mean(recon_sq, axis=(-3, -2, -1)) * mask
        ) / n_valid

        crit_loss = critical_loss(
            output_shapes,
            reference_arrays,
            critical_mask,
            TVs,
            articulators,
            denorm_mean=denorm_mean,
            denorm_std=denorm_std,
        )

        if recognizer_fn is not None:
            # (B, T, Nart, 2, D) -> (B, C=2, Nart*D, T) recognizer layout.
            def to_rec(x):
                return x.transpose(0, 3, 2, 4, 1).reshape(b, 2, n_art * d, t)

            tgt_feats = jax.lax.stop_gradient(
                recognizer_fn(to_rec(target_shapes), voicing)
            )
            out_feats = recognizer_fn(to_rec(output_shapes), voicing)
            rec_sq = (out_feats - tgt_feats) ** 2  # (B, T, F)
            rec_loss = jnp.sum(jnp.mean(rec_sq, axis=-1) * mask) / n_valid
        else:
            rec_loss = jnp.asarray(0.0, target_shapes.dtype)

        return (
            beta1 * latent_loss
            + beta2 * recon_loss
            + beta3 * crit_loss
            + beta4 * rec_loss
        )

    return loss_fn


def decoder_mean_p2cp_mm(
    output_pcs,
    target_shapes,
    lengths,
    decode_fn: Callable,
    denorm_mean,
    denorm_std,
    to_mm: float,
    rescale_factor: float = 1.0,
):
    """Valid metric: decode latents, denormalize, P2CP in mm
    (reference principal_components/metrics.py:12-61)."""
    from artspeech_tpu.ops.distances import mean_p2cp_channel_major

    b, t, n_art, _, d = target_shapes.shape
    shapes = decode_fn(rescale_factor * output_pcs).reshape(b, t, n_art, 2, d)
    shapes = shapes * denorm_std + denorm_mean
    targets = target_shapes * denorm_std + denorm_mean
    p2cp = mean_p2cp_channel_major(shapes, targets)  # (B, T, Nart)
    mask = make_padding_mask(lengths, t).astype(p2cp.dtype)[:, :, None]
    return jnp.sum(p2cp * mask * to_mm) / jnp.maximum(
        jnp.sum(mask) * n_art, 1.0
    )
