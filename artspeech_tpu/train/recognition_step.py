"""Jitted train/eval steps for the DeepSpeech2 phoneme recognizer.

Equivalent role to reference phoneme_recognition/__init__.py:63-153
(``run_epoch`` body), fused TPU-first: for the melspec feature the batch
carries raw audio and the spectrogram is computed IN-GRAPH (one XLA program
covering melspec -> conv stem -> residual CNN -> GRU -> CTC/CE loss ->
grads), removing the host-side torchaudio feature step entirely. The greedy
CTC decode also runs in-graph so the PER metric needs a single small
transfer of decoded ids.
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artspeech_tpu.ops.rng import as_rbg_key
from artspeech_tpu.eval.decoders import greedy_ctc_decode
from artspeech_tpu.losses.recognition import (
    cross_entropy_loss,
    cross_entropy_loss_parts,
    ctc_loss,
    ctc_loss_parts,
)
from artspeech_tpu.models.deepspeech2 import get_noise_logits
from artspeech_tpu.ops.melspec import dynamic_range_compression, melspectrogram


def cyclic_triangular_schedule(
    base_lr: float, max_lr: float, step_size: int = 2000
) -> Callable:
    """torch.optim.lr_scheduler.CyclicLR(triangular) equivalent
    (reference train_phoneme_recognition.py:184-189: base_lr = lr/25,
    max_lr = lr, cycle_momentum=False)."""

    def schedule(step):
        cycle = jnp.floor(1 + step / (2.0 * step_size))
        x = jnp.abs(step / step_size - 2.0 * cycle + 1.0)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


def make_feature_fn(
    feature: str,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
):
    """Build the in-graph feature extractor batch -> (B, C, D, T)."""

    if feature == "melspec":

        def feature_fn(batch):
            mel = melspectrogram(
                batch["audio"],
                sample_rate=sample_rate,
                n_fft=n_fft,
                hop_length=hop_length,
                n_mels=n_mels,
            )  # (B, n_mels, T)
            mel = dynamic_range_compression(mel)
            # mono duplicated to stereo channels (reference datasets.py:129).
            return jnp.stack([mel, mel], axis=1)  # (B, 2, D, T)

    else:

        def feature_fn(batch):
            return batch["features"]

    return feature_fn


def recognizer_accum_steps(collate_batch_size, n_devices: int = 1,
                           dtype=None, microbatch=None) -> int:
    """Measured serving-batch policy for the recognizer trainer.

    Like the transformer (train/step.py transformer_accum_steps), the
    recognizer's per-frame throughput DEGRADES with batch on one chip
    (v5e, 5.1s audio, melspec+CTC, f32 device: B=8 211k, B=32 107k, B=64
    94k frames/s — bench_details.json recognizer_train_step rows): the
    conv-stack activation live set outgrows HBM and XLA spills. Scanning
    small microbatches restores and beats the small-batch rate. The
    microbatch sweep at B=64 (device spans; round 5): f32 mb 64/16/8/4 =
    219/150/113/109ms -> optimum FOUR; bf16 = 167/108/84/99ms -> optimum
    EIGHT (244k frames/s, 2.0x over plain in both dtypes). Off under dp
    (per-device shards are already small) and for indivisible batches.
    """
    if microbatch is None:
        try:
            name = np.dtype(dtype).name if dtype is not None else None
        except TypeError:
            name = str(dtype)
        microbatch = 8 if name in ("bfloat16", "bf16") else 4
    b = int(collate_batch_size or 0)
    if n_devices > 1 or b < 32 or b % microbatch != 0:
        return 1
    return b // microbatch


def make_recognition_train_step(
    model,
    criterion: str,
    target_key: str,
    feature: str = "melspec",
    use_voicing: bool = False,
    logits_large_margins: float = 0.0,
    class_weights=None,
    blank_id: int = 0,
    melspec_kwargs: Optional[dict] = None,
    donate: bool = True,
    accum_steps: int = 1,
):
    """criterion: "ctc" | "ce"; target_key: e.g. "ctc_target".

    ``accum_steps > 1`` scans that many microbatches inside the jitted
    step, accumulating gradients — EXACT for both criteria because the
    loss denominators (valid-sequence count for CTC, pad/class-weight sum
    for CE) depend only on the batch, so they are computed globally before
    the scan and every microbatch contributes numerator/global_denominator
    (losses/recognition.py *_parts). See :func:`recognizer_accum_steps`
    for the measured policy.
    """
    feature_fn = make_feature_fn(feature, **(melspec_kwargs or {}))
    if accum_steps > 1:
        return _make_recognition_train_step_accum(
            feature_fn, criterion, target_key, use_voicing,
            logits_large_margins, class_weights, blank_id, donate,
            accum_steps,
        )

    def train_step(state, batch, rng):
        def loss_fn(params):
            inputs = feature_fn(batch)
            voicing = batch["voicing"] if use_voicing else None
            logits = state.apply_fn(
                {"params": params},
                inputs,
                voicing=voicing,
                lengths=batch["input_lengths"],
                deterministic=False,
                rngs={"dropout": as_rbg_key(rng)},
            )
            if logits_large_margins > 0.0:
                noise_rng = jax.random.fold_in(rng, 1)
                logits = get_noise_logits(logits, logits_large_margins, noise_rng)
            targets = batch[target_key]
            target_lengths = batch[f"{target_key}_lengths"]
            if criterion == "ctc":
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                loss = ctc_loss(
                    log_probs,
                    targets,
                    batch["input_lengths"],
                    target_lengths,
                    blank_id=blank_id,
                )
            else:
                loss = cross_entropy_loss(
                    logits,
                    targets,
                    batch["input_lengths"],
                    class_weights=class_weights,
                )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _make_recognition_train_step_accum(
    feature_fn, criterion, target_key, use_voicing, logits_large_margins,
    class_weights, blank_id, donate, accum_steps,
):
    """Microbatched (gradient-accumulation) recognition train step — see
    :func:`make_recognition_train_step` ``accum_steps``."""

    def train_step(state, batch, rng):
        b = batch["input_lengths"].shape[0]
        if b % accum_steps != 0:
            raise ValueError(f"batch {b} not divisible by accum_steps={accum_steps}")
        mb = b // accum_steps
        targets = batch[target_key]
        target_lengths = batch[f"{target_key}_lengths"]

        # Global denominator: depends only on lengths/targets, never params.
        if criterion == "ctc":
            den = jnp.maximum(
                jnp.sum((target_lengths > 0).astype(jnp.float32)), 1.0
            )
        else:
            t_full = batch["audio"].shape[1] if "audio" in batch else None
            # CE weight-sum from a dry mask pass: weights are
            # class_weights[target] * pad_mask, computable without logits.
            from artspeech_tpu.utils.masks import make_padding_mask

            t_frames = targets.shape[1]
            mask = make_padding_mask(batch["input_lengths"], t_frames).astype(
                jnp.float32
            )
            if class_weights is not None:
                den = jnp.maximum(
                    jnp.sum(class_weights[jnp.maximum(targets, 0)] * mask), 1.0
                )
            else:
                den = jnp.maximum(jnp.sum(mask), 1.0)
            del t_full

        def split(x):
            return x.reshape(accum_steps, mb, *x.shape[1:])

        xs = {k: split(v) for k, v in batch.items()}
        xs["idx"] = jnp.arange(accum_steps)

        def micro_loss(params, mb_batch, mb_rng):
            inputs = feature_fn(mb_batch)
            voicing = mb_batch["voicing"] if use_voicing else None
            logits = state.apply_fn(
                {"params": params},
                inputs,
                voicing=voicing,
                lengths=mb_batch["input_lengths"],
                deterministic=False,
                rngs={"dropout": as_rbg_key(mb_rng)},
            )
            if logits_large_margins > 0.0:
                noise_rng = jax.random.fold_in(mb_rng, 1)
                logits = get_noise_logits(logits, logits_large_margins, noise_rng)
            if criterion == "ctc":
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                num, _ = ctc_loss_parts(
                    log_probs,
                    mb_batch[target_key],
                    mb_batch["input_lengths"],
                    mb_batch[f"{target_key}_lengths"],
                    blank_id=blank_id,
                )
            else:
                num, _ = cross_entropy_loss_parts(
                    logits,
                    mb_batch[target_key],
                    mb_batch["input_lengths"],
                    class_weights=class_weights,
                )
            return num / den

        grad_fn = jax.value_and_grad(micro_loss)

        def body(carry, x):
            loss_acc, grads_acc = carry
            mb_rng = jax.random.fold_in(rng, x["idx"])
            mb_batch = {k: v for k, v in x.items() if k != "idx"}
            loss_i, grads_i = grad_fn(state.params, mb_batch, mb_rng)
            return (
                loss_acc + loss_i,
                jax.tree_util.tree_map(jnp.add, grads_acc, grads_i),
            ), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros(()), zeros), xs)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_recognition_eval_step(
    model,
    criterion: str,
    target_key: str,
    feature: str = "melspec",
    use_voicing: bool = False,
    class_weights=None,
    blank_id: int = 0,
    melspec_kwargs: Optional[dict] = None,
    return_features: bool = False,
):
    """Eval step returning loss + in-graph greedy decode (and features)."""
    feature_fn = make_feature_fn(feature, **(melspec_kwargs or {}))

    def eval_step(state, batch):
        inputs = feature_fn(batch)
        voicing = batch["voicing"] if use_voicing else None
        out = state.apply_fn(
            {"params": state.params},
            inputs,
            voicing=voicing,
            lengths=batch["input_lengths"],
            return_features=return_features,
            deterministic=True,
        )
        logits, features = out if return_features else (out, None)
        targets = batch[target_key]
        target_lengths = batch[f"{target_key}_lengths"]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if criterion == "ctc":
            loss = ctc_loss(
                log_probs,
                targets,
                batch["input_lengths"],
                target_lengths,
                blank_id=blank_id,
            )
        else:
            loss = cross_entropy_loss(
                logits,
                targets,
                batch["input_lengths"],
                class_weights=class_weights,
            )
        decoded, decoded_lengths = greedy_ctc_decode(
            log_probs, batch["input_lengths"], blank_id=blank_id
        )
        result = {
            "loss": loss,
            "decoded": decoded,
            "decoded_lengths": decoded_lengths,
            "log_probs": log_probs,
        }
        if return_features:
            result["features"] = features
        return result

    return jax.jit(eval_step)
