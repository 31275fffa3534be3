"""Test harness for phoneme-to-articulation models.

Equivalent of reference encoder_decoder/evaluation.py:17-161 (``run_test``),
redesigned TPU-first: ONE jitted program per bucket computes, for the whole
batch, the masked loss, per-(sentence, articulator) P2CP / MED / Pearson
correlations, B-spline regularized outputs, upper-incisor injection and the
tract variables of predictions and targets — a single device->host transfer
per batch instead of the reference's per-sentence ``.item()`` loops.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.core.constants import (
    REQUIRED_ARTICULATORS_FOR_TVS,
    UPPER_INCISOR,
)
from artspeech_tpu.eval.artifacts import (
    save_contours,
    save_tract_variables_csv,
    tvs_to_records,
)
from artspeech_tpu.geometry.tract_variables import tract_variables_from_stack
from artspeech_tpu.losses.articulation import masked_euclidean_loss
from artspeech_tpu.ops.bspline import regularize_bsplines
from artspeech_tpu.ops.distances import (
    euclidean_distance,
    mean_p2cp_channel_major,
    pearson_correlation,
)
from artspeech_tpu.utils.masks import make_padding_mask


def inject_upper_incisor(stack, references, articulators: Sequence[str]):
    """Insert the reference (upper incisor) contour into the articulator axis.

    Equivalent of reference encoder_decoder/evaluation.py:93-109. ``stack`` is
    (B, T, Nart, 2, D), ``references`` (B, T, 1, 2, D). Returns
    (stack_with_ref, tv_articulators).
    """
    if UPPER_INCISOR in articulators:
        return stack, list(articulators)
    tv_articulators = sorted(list(articulators) + [UPPER_INCISOR])
    ref_idx = tv_articulators.index(UPPER_INCISOR)
    merged = jnp.concatenate(
        [stack[:, :, :ref_idx], references, stack[:, :, ref_idx:]], axis=2
    )
    return merged, tv_articulators


def per_sentence_metrics(outputs, targets, lengths):
    """Per-(sentence, articulator) metrics, padding-masked.

    Returns dict of (B, Nart) arrays: p2cp, med, x_corr, y_corr.
    """
    mask = make_padding_mask(lengths, outputs.shape[1])  # (B, T)
    fmask = mask[:, :, None].astype(outputs.dtype)  # (B, T, 1)
    denom_t = jnp.maximum(lengths.astype(outputs.dtype), 1.0)[:, None]

    # P2CP / MED per frame -> masked time mean.
    p2cp = mean_p2cp_channel_major(outputs, targets)  # (B, T, Nart)
    p2cp = jnp.sum(p2cp * fmask, axis=1) / denom_t  # (B, Nart)

    med = jnp.mean(euclidean_distance(outputs, targets), axis=-1)  # (B, T, Nart)
    med = jnp.sum(med * fmask, axis=1) / denom_t

    # Pearson over time per (articulator, axis, sample point), then mean over
    # points — masked (reference metrics.py:9-35, with its target-mean bug
    # fixed; see ops.distances.pearson_correlation).
    corr_mask = mask[:, :, None, None]  # broadcast over (Nart, D)
    x_corr = pearson_correlation(
        outputs[:, :, :, 0, :], targets[:, :, :, 0, :], mask=corr_mask, axis=1
    ).mean(axis=-1)
    y_corr = pearson_correlation(
        outputs[:, :, :, 1, :], targets[:, :, :, 1, :], mask=corr_mask, axis=1
    ).mean(axis=-1)
    return {"p2cp": p2cp, "med": med, "x_corr": x_corr, "y_corr": y_corr}


def make_test_step(
    apply_fn,
    articulators: Sequence[str],
    regularize_out: bool = False,
    compute_tvs: bool = True,
):
    """Build the jitted full evaluation program for one bucket signature."""

    articulators = sorted(articulators)

    @jax.jit
    def test_step(params, batch):
        outputs = apply_fn(params, batch["tokens"], batch["lengths"])
        targets = batch["targets"]
        lengths = batch["lengths"]
        loss = masked_euclidean_loss(outputs, targets, lengths)
        metrics = per_sentence_metrics(outputs, targets, lengths)

        merged_raw, tv_articulators = inject_upper_incisor(
            outputs, batch["references"], articulators
        )
        merged_tgt, _ = inject_upper_incisor(
            targets, batch["references"], articulators
        )

        # TVs are computed on the RAW outputs (reference run_test calls
        # tract_variables before save_outputs' optional regularization,
        # encoder_decoder/evaluation.py:111-140).
        tvs_pred = tvs_tgt = None
        if compute_tvs and all(
            a in tv_articulators for a in REQUIRED_ARTICULATORS_FOR_TVS
        ):
            tvs_pred = tract_variables_from_stack(merged_raw, tv_articulators)
            tvs_tgt = tract_variables_from_stack(merged_tgt, tv_articulators)
            tvs_pred = {k: v for k, v in tvs_pred.items() if v is not None}
            tvs_tgt = {k: v for k, v in tvs_tgt.items() if v is not None}

        merged_out = merged_raw
        if regularize_out:
            merged_out = jnp.swapaxes(
                regularize_bsplines(jnp.swapaxes(merged_raw, -1, -2)), -1, -2
            )

        return {
            "loss": loss,
            "metrics": metrics,
            "outputs": merged_out,
            "targets": merged_tgt,
            "tvs_pred": tvs_pred,
            "tvs_tgt": tvs_tgt,
        }

    return test_step, (
        sorted(set(articulators) | {UPPER_INCISOR})
        if UPPER_INCISOR not in articulators
        else list(articulators)
    )


def run_test(
    params,
    apply_fn,
    loader,
    articulators: Sequence[str],
    to_mm: float,
    outputs_dir: Optional[str] = None,
    regularize_out: bool = False,
    save_artifacts: bool = True,
    loss_agg: str = "batch",
) -> Dict:
    """Evaluate over a loader; write contour npys + TV CSVs; return the
    reference run_test info dict {loss, {articulator: {x_corr, y_corr, p2cp,
    p2cp_mm, med, med_mm}}} (encoder_decoder/evaluation.py:141-161).

    ``loss_agg`` mirrors the two aggregation conventions in the reference:
    "batch" averages the masked frame-mean loss per batch then over batches
    (encoder_decoder/evaluation.py:58-63,87), "sentence" averages
    per-sentence means (phoneme_wise_mean_contour/__init__.py:180,241 loops
    sentences one at a time). They differ whenever sentence lengths or
    bucket fills are uneven, so each CLI picks its reference's convention.
    """
    if loss_agg not in ("batch", "sentence"):
        raise ValueError(f"loss_agg must be 'batch' or 'sentence': {loss_agg!r}")
    articulators = sorted(articulators)
    test_step, tv_articulators = make_test_step(
        apply_fn, articulators, regularize_out=regularize_out
    )

    losses = []
    acc = {k: [] for k in ("p2cp", "med", "x_corr", "y_corr")}
    for batch, meta in loader:
        result = test_step(params, batch)
        result = jax.device_get(result)
        lengths = np.asarray(batch["lengths"])
        valid = lengths > 0
        for k in acc:
            acc[k].append(np.asarray(result["metrics"][k])[valid])
        if loss_agg == "sentence":
            # Per-sentence EuclideanDistance mean == ``med`` averaged over
            # articulators; aggregating per sentence (not per padded batch)
            # is what closed the mean-contour parity leg from 0.5% to 2e-8.
            losses.append(acc["med"][-1].mean(axis=1))
        else:
            losses.append(np.asarray([float(result["loss"])]))

        if outputs_dir is not None and save_artifacts:
            _write_batch_artifacts(
                result, meta, lengths, tv_articulators, outputs_dir
            )

    info = {"loss": float(np.mean(np.concatenate(losses)))}
    stacked = {k: np.concatenate(v, axis=0) for k, v in acc.items()}
    for i_art, art in enumerate(articulators):
        info[art] = {
            "x_corr": float(np.mean(stacked["x_corr"][:, i_art])),
            "y_corr": float(np.mean(stacked["y_corr"][:, i_art])),
            "p2cp": float(np.mean(stacked["p2cp"][:, i_art])),
            "p2cp_mm": float(np.mean(stacked["p2cp"][:, i_art]) * to_mm),
            "med": float(np.mean(stacked["med"][:, i_art])),
            "med_mm": float(np.mean(stacked["med"][:, i_art]) * to_mm),
        }
    return info


def _write_batch_artifacts(result, meta, lengths, tv_articulators, outputs_dir):
    outputs = np.asarray(result["outputs"])
    targets = np.asarray(result["targets"])
    for i, sentence_id in enumerate(meta["sentence_names"]):
        L = int(lengths[i])
        if L == 0:
            continue
        frame_ids = meta["frame_ids"][i][:L]
        phonemes = meta["phonemes"][i][:L]
        save_contours(
            sentence_id,
            frame_ids,
            outputs[i, :L],
            targets[i, :L],
            phonemes,
            tv_articulators,
            outputs_dir,
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
            records = tvs_to_records(
                sentence_id, frame_ids, phonemes, pred_tvs, tgt_tvs
            )
            save_tract_variables_csv(sentence_id, records, outputs_dir)
