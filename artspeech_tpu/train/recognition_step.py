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
import optax

from artspeech_tpu.ops.rng import as_rbg_key
from artspeech_tpu.eval.decoders import greedy_ctc_decode
from artspeech_tpu.losses.recognition import cross_entropy_loss, ctc_loss
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
):
    """criterion: "ctc" | "ce"; target_key: e.g. "ctc_target"."""
    feature_fn = make_feature_fn(feature, **(melspec_kwargs or {}))

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
