"""Jitted train/eval steps for the phoneme-to-articulation models.

The whole step (forward, masked loss, backward, optimizer update) is one
compiled XLA program; with a (data, model) mesh the batch is sharded over
``data`` and stacked articulator-head parameters over ``model`` (see
artspeech_tpu.parallel.mesh). Equivalent role to reference
train_phoneme_to_articulation.py:45-121, minus the host round trips.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.ops.rng import as_rbg_key
from artspeech_tpu.losses.articulation import (
    masked_euclidean_loss,
    p2cp_distance_mm,
    recognition_feature_loss,
)


def make_artspeech_train_step(
    to_mm: float,
    donate: bool = True,
    recognizer_fn=None,
    recognition_weight: float = 1.0,
    with_p2cp: bool = False,
    mesh=None,
):
    """Build the jitted training step for ArtSpeech-family models.

    Batch layout: dict with ``tokens`` (B, T), ``targets`` (B, T, Nart, 2, D),
    ``lengths`` (B,).

    With ``recognizer_fn`` (a FROZEN feature extractor
    (shapes (B, C, Nart*D, T), voicing) -> (B, T, F)), the loss adds the deep
    perceptual supervision term of reference encoder_decoder/loss.py:6-37
    (``ArtSpeechLoss``): MSE between recognizer features of outputs vs targets.

    ``with_p2cp`` adds the P2CP metric to the train-step outputs. Off by
    default: the reference computes fn_metrics only in the VALID phase
    (train_phoneme_to_articulation.py:259-284 passes ``fn_metrics`` to
    run_epoch for VALID but not TRAIN), and the 50x50 pairwise-distance
    pipeline over every (B, T, Nart) contour costs a measured 3.8ms f32 /
    3.6ms bf16 of the B=256 step (~17/23%). Model selection is unaffected —
    ``fit`` monitors the valid-epoch metric.

    ``mesh`` (a Mesh with a ``data`` axis) builds the shard_map variant
    instead: the batch axis is explicitly manual-sharded, gradients ride one
    psum over ICI, and — unlike the auto-GSPMD path ``fit`` uses by default —
    the fused Pallas recurrence kernels (ops/pallas_gru.py) still dispatch,
    because pallas_call is partitionable only under manual mesh axes. Same
    normalization as single-device (global masked means via globally summed
    denominators); dropout masks are drawn per shard (fold_in of the data
    axis index), so trajectories match exactly only at dropout=0.

    Both variants report a ``manual_spmd`` marker metric (0.0 auto-GSPMD /
    1.0 shard_map) so epoch logs record which dp path actually ran — the
    dp CLI equality tests assert on it.
    """
    if mesh is not None:
        return _make_artspeech_train_step_shard_map(
            to_mm, mesh, donate, recognizer_fn, recognition_weight, with_p2cp
        )

    def train_step(state, batch, dropout_rng):
        def loss_fn(params):
            outputs = state.apply_fn(
                {"params": params},
                batch["tokens"],
                batch["lengths"],
                deterministic=False,
                rngs={"dropout": as_rbg_key(dropout_rng)},
            )
            loss = masked_euclidean_loss(outputs, batch["targets"], batch["lengths"])
            if recognizer_fn is not None:
                b, t, n_art, _, d = outputs.shape

                def to_rec(x):
                    return x.transpose(0, 3, 2, 4, 1).reshape(b, 2, n_art * d, t)

                voicing = batch.get("voicing")
                out_feats = recognizer_fn(to_rec(outputs), voicing)
                tgt_feats = jax.lax.stop_gradient(
                    recognizer_fn(to_rec(batch["targets"]), voicing)
                )
                loss = loss + recognition_weight * recognition_feature_loss(
                    out_feats, tgt_feats, batch["lengths"]
                )
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "manual_spmd": jnp.zeros(())}
        if with_p2cp:
            metrics["p2cp_mm"] = p2cp_distance_mm(
                outputs, batch["targets"], batch["lengths"], to_mm=to_mm
            )
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def prefer_manual_spmd(mesh, collate_batch_size, hidden_size=128) -> bool:
    """Should dp training build the shard_map step variant?

    True when the mesh has >1 devices AND the per-shard batch/hidden reach
    the fused Pallas recurrence kernels' dispatch floor (ops/pallas_gru.py
    ``supported``: per-shard B >= 64 and 8-aligned, lane-aligned hidden) —
    the large-batch dp configuration the kernels were built for, which the
    auto-GSPMD path silently falls back from (pallas_call would be
    replicated under auto mode, so ``_spmd_safe`` disables the kernels
    there). Below the floor the kernels would not dispatch anyway, so the
    default auto-GSPMD step is kept: identical math, and its replicated
    dropout stream matches the single-device reference trajectory exactly
    (the shard_map variant folds the shard index into the dropout key).
    Time-axis divisibility is NOT gated here — buckets vary per batch and
    the kernel self-dispatches per shape inside the step.
    """
    if mesh is None or getattr(mesh, "size", 1) <= 1 or not collate_batch_size:
        return False
    n = mesh.size
    if collate_batch_size % n != 0:
        return False
    per_shard = collate_batch_size // n
    return per_shard >= 64 and per_shard % 8 == 0 and hidden_size % 128 == 0


def _make_artspeech_train_step_shard_map(
    to_mm, mesh, donate, recognizer_fn, recognition_weight, with_p2cp
):
    """shard_map (manual SPMD) variant of the ArtSpeech train step.

    Exactness: the local loss is normalized by the GLOBAL denominators
    (valid-cell counts depend only on lengths, so they are psum'd before the
    grad), making ``psum(local_loss)`` and ``psum(local_grads)`` bit-equal in
    expectation to the single-program global masked means. The optimizer
    update runs identically on every shard over replicated params/opt state.
    """
    from jax.sharding import PartitionSpec as P

    from artspeech_tpu.ops.distances import euclidean_distance
    from artspeech_tpu.utils.masks import make_padding_mask

    axis = "data"

    def step(state, batch, dropout_rng):
        targets, lengths = batch["targets"], batch["lengths"]
        t = targets.shape[1]
        mask = make_padding_mask(lengths, t)
        n_frames = jax.lax.psum(jnp.sum(mask), axis)
        n_euclid = (
            jnp.maximum(n_frames, 1.0) * targets.shape[2] * targets.shape[4]
        )
        shard_rng = jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            outputs = state.apply_fn(
                {"params": params},
                batch["tokens"],
                lengths,
                deterministic=False,
                rngs={"dropout": as_rbg_key(shard_rng)},
            )
            dist = euclidean_distance(outputs, targets)  # (b, T, Nart, D)
            w = mask[:, :, None, None].astype(dist.dtype)
            loss_local = jnp.sum(dist * w) / n_euclid
            if recognizer_fn is not None:
                b, tt, n_art, _, d = outputs.shape

                def to_rec(x):
                    return x.transpose(0, 3, 2, 4, 1).reshape(b, 2, n_art * d, tt)

                voicing = batch.get("voicing")
                out_feats = recognizer_fn(to_rec(outputs), voicing)
                tgt_feats = jax.lax.stop_gradient(
                    recognizer_fn(to_rec(targets), voicing)
                )
                n_rec = jnp.maximum(n_frames, 1.0) * out_feats.shape[-1]
                sq = (out_feats - tgt_feats) ** 2
                loss_local = loss_local + recognition_weight * (
                    jnp.sum(sq * mask[:, :, None].astype(sq.dtype)) / n_rec
                )
            return loss_local, outputs

        (loss_local, outputs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        loss = jax.lax.psum(loss_local, axis)
        grads = jax.lax.psum(grads, axis)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "manual_spmd": jnp.ones(())}
        if with_p2cp:
            # The global metric is a mean over VALID (length>0) sentences;
            # bucket-padding dummy rows can land unevenly across shards, so
            # psum the numerator and the valid count separately — a pmean of
            # per-shard means would weight shards, not sentences.
            per_sentence, valid = p2cp_distance_mm(
                outputs, targets, lengths, to_mm=to_mm, reduce=False
            )
            num = jax.lax.psum(jnp.sum(per_sentence), axis)
            den = jax.lax.psum(jnp.sum(valid), axis)
            metrics["p2cp_mm"] = num / jnp.maximum(den, 1.0)
        return state, metrics

    batch_spec = {
        "tokens": P(axis),
        "targets": P(axis),
        "lengths": P(axis),
        "voicing": P(axis),
    }

    def in_batch_spec(batch):
        return {k: batch_spec.get(k, P(axis)) for k in batch}

    def train_step(state, batch, dropout_rng):
        mapped = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), in_batch_spec(batch), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return mapped(state, batch, dropout_rng)

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


def shift_targets_right(targets):
    """(B, T, Nart, 2, D) -> (B, T, Nart, 2*D) teacher-forcing input with a
    zero start frame (reference train_phoneme_to_articulation_transformer.py:99-111)."""
    b, t, n_art, two, d = targets.shape
    flat = targets.reshape(b, t, n_art, two * d)
    start = jnp.zeros((b, 1, n_art, two * d), flat.dtype)
    return jnp.concatenate([start, flat[:, :-1]], axis=1)


def make_transformer_train_step(
    to_mm: float,
    donate: bool = True,
    with_p2cp: bool = False,
    accum_steps: int = 1,
):
    """Teacher-forced training step for ArtSpeechTransformer.

    ``with_p2cp`` as in :func:`make_artspeech_train_step` — the reference
    trainer computes P2CP only on the valid phase
    (train_phoneme_to_articulation_transformer.py mirrors
    train_phoneme_to_articulation.py's run_epoch split).

    ``accum_steps`` splits the batch into that many microbatches and
    accumulates gradients over a ``lax.scan`` INSIDE the one jitted step
    (single optimizer update). Why: at serving batch the decoder's live
    activation set — the (B, C, C-1, H, L, L) cross-channel score tensor is
    1.5GB/layer f32 at B=64/T=128 plus ~10 pair tensors of 189MB each —
    outgrows HBM and XLA starts spilling/rematerializing ad hoc (the
    ``.remat`` ops in the B=64 op profile; explicit ``nn.remat`` was
    measured WORSE there: 183->227ms f32, 101->137ms bf16). Scanning
    microbatches keeps the live set at microbatch scale with one extra
    params read per microbatch (~24MB, negligible). The loss is EXACT:
    each microbatch contributes ``masked_sum / n_valid_global`` with the
    global denominator computed from the full batch's lengths up front, so
    the accumulated loss/grads equal the full-batch ones up to float
    summation order. Dropout draws a distinct key per microbatch (fold_in
    of the microbatch index), so trajectories match the accum_steps=1 step
    exactly only at dropout=0.
    """
    if accum_steps > 1:
        return _make_transformer_train_step_accum(
            to_mm, donate, with_p2cp, accum_steps
        )

    def train_step(state, batch, dropout_rng):
        def loss_fn(params):
            tgt_in = shift_targets_right(batch["targets"])
            outputs = state.apply_fn(
                {"params": params},
                batch["tokens"],
                tgt_in,
                src_lengths=batch["lengths"],
                tgt_lengths=batch["lengths"],
                deterministic=False,
                rngs={"dropout": as_rbg_key(dropout_rng)},
            )
            loss = masked_euclidean_loss(outputs, batch["targets"], batch["lengths"])
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        if with_p2cp:
            metrics["p2cp_mm"] = p2cp_distance_mm(
                outputs, batch["targets"], batch["lengths"], to_mm=to_mm
            )
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def transformer_accum_steps(
    collate_batch_size, n_devices: int = 1, dtype=None, microbatch=None
) -> int:
    """Measured serving-batch policy for the transformer trainer.

    The plain step's per-frame throughput DEGRADES with batch on one chip
    (v5e, T=128, C=10, f32: B=12 67.9k, B=16 64.2k, B=32 61.2k, B=64 44.8k
    frames/s — the live cross-channel activation set outgrows HBM and XLA
    spills); scanning small microbatches restores and beats the
    small-batch rate. The microbatch-size sweep at B=64 (device spans
    reproducible to 0.01ms; benchmarks/NOTES.md "Microbatched grad
    accumulation") puts the optimum at TWO sentences for f32 (84.4ms,
    97.1k frames/s) and FOUR for bf16 (59.6ms, 137.5k) — mb=1 regresses
    both (the per-iteration fixed cost outgrows the spill savings) — so
    the default microbatch is dtype-dependent unless pinned explicitly.
    Returns ``collate_batch_size // microbatch`` when the batch is big
    enough (>=32) and divisible; 1 otherwise. Under dp (``n_devices >
    1``) the per-device shard is already microbatch-sized, so
    accumulation stays off.
    """
    if microbatch is None:
        # Normalize BOTH spellings the callers use: config strings
        # ("bfloat16"/"bf16") and the jnp dtype class the train CLI passes
        # after resolve_dtype (str(jnp.bfloat16) is "<class ...>", so a raw
        # string compare would silently fall through to the f32 microbatch).
        try:
            name = np.dtype(dtype).name if dtype is not None else None
        except TypeError:
            name = str(dtype)
        microbatch = 4 if name in ("bfloat16", "bf16") else 2
    b = int(collate_batch_size or 0)
    if n_devices > 1 or b < 32 or b % microbatch != 0:
        return 1
    return b // microbatch


def _make_transformer_train_step_accum(to_mm, donate, with_p2cp, accum_steps):
    """Microbatched (gradient-accumulation) transformer train step — see
    :func:`make_transformer_train_step` ``accum_steps``."""
    from artspeech_tpu.ops.distances import euclidean_distance
    from artspeech_tpu.utils.masks import make_padding_mask

    def train_step(state, batch, dropout_rng):
        b, t = batch["tokens"].shape
        if b % accum_steps != 0:
            raise ValueError(
                f"batch {b} not divisible by accum_steps={accum_steps}"
            )
        mb = b // accum_steps
        mask = make_padding_mask(batch["lengths"], t)
        targets = batch["targets"]
        # Global denominator (depends only on lengths): every microbatch
        # contributes masked_sum / n_valid, so the sum over microbatches is
        # the full-batch masked mean exactly.
        n_valid = (
            jnp.maximum(jnp.sum(mask), 1.0) * targets.shape[2] * targets.shape[4]
        )

        def split(x):
            return x.reshape(accum_steps, mb, *x.shape[1:])

        xs = {
            "tokens": split(batch["tokens"]),
            "targets": split(targets),
            "lengths": split(batch["lengths"]),
            "idx": jnp.arange(accum_steps),
        }

        def micro_loss(params, mb_tokens, mb_targets, mb_lengths, rng):
            tgt_in = shift_targets_right(mb_targets)
            outputs = state.apply_fn(
                {"params": params},
                mb_tokens,
                tgt_in,
                src_lengths=mb_lengths,
                tgt_lengths=mb_lengths,
                deterministic=False,
                rngs={"dropout": as_rbg_key(rng)},
            )
            dist = euclidean_distance(outputs, mb_targets)
            w = make_padding_mask(mb_lengths, t)[:, :, None, None].astype(dist.dtype)
            return jnp.sum(dist * w) / n_valid, outputs

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def body(carry, x):
            loss_acc, grads_acc, num_acc, den_acc = carry
            rng = jax.random.fold_in(dropout_rng, x["idx"])
            (loss_i, outputs), grads_i = grad_fn(
                state.params, x["tokens"], x["targets"], x["lengths"], rng
            )
            carry = (
                loss_acc + loss_i,
                jax.tree_util.tree_map(jnp.add, grads_acc, grads_i),
                num_acc,
                den_acc,
            )
            if with_p2cp:
                per_sentence, valid = p2cp_distance_mm(
                    outputs, x["targets"], x["lengths"], to_mm=to_mm, reduce=False
                )
                carry = (
                    carry[0],
                    carry[1],
                    num_acc + jnp.sum(per_sentence),
                    den_acc + jnp.sum(valid),
                )
            return carry, None

        zeros_like_params = jax.tree_util.tree_map(
            jnp.zeros_like, state.params
        )
        (loss, grads, p2cp_num, p2cp_den), _ = jax.lax.scan(
            body, (jnp.zeros(()), zeros_like_params, jnp.zeros(()), jnp.zeros(())), xs
        )
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        if with_p2cp:
            metrics["p2cp_mm"] = p2cp_num / jnp.maximum(p2cp_den, 1.0)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_transformer_eval_step(to_mm: float):
    """Teacher-forced eval step for the valid loop (fast); autoregressive
    evaluation is done by the test harness via model.generate."""

    def eval_step(state, batch):
        tgt_in = shift_targets_right(batch["targets"])
        outputs = state.apply_fn(
            {"params": state.params},
            batch["tokens"],
            tgt_in,
            src_lengths=batch["lengths"],
            tgt_lengths=batch["lengths"],
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
