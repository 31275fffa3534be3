"""Latent sequence model: phonemes -> principal components.

Equivalents of reference principal_components/models/rnn.py:11-109
(``PrincipalComponentsPredictor``, ``PrincipalComponentsArtSpeech``) and
models/__init__.py:20-43 (``PrincipalComponentsArtSpeechWrapper``).
"""

from typing import Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.models.autoencoder import (
    MultiDecoder,
    latent_size_of,
    normalize_indices_dict,
)
from artspeech_tpu.ops.gru import BiGRU, BiLSTM
from artspeech_tpu.utils.masks import make_padding_mask


class PrincipalComponentsPredictor(nn.Module):
    """LN/Dense MLP head (reference rnn.py:11-33)."""

    num_components: int
    hidden_features: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.relu(nn.Dense(self.hidden_features)(h))
        h = nn.LayerNorm()(h)
        h = nn.relu(nn.Dense(self.hidden_features // 2)(h))
        h = nn.LayerNorm()(h)
        return nn.Dense(self.num_components)(h)


class PrincipalComponentsArtSpeech(nn.Module):
    """Embedding -> 2-layer Bi{GRU,LSTM} -> MLP -> tanh -> (B, T, latent)
    (reference rnn.py:36-109)."""

    vocab_size: int
    indices_dict: Dict
    embed_dim: int = 64
    hidden_size: int = 128
    rnn_dropout: float = 0.0
    rnn: str = "GRU"

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        indices = normalize_indices_dict(self.indices_dict)
        latent = latent_size_of(indices)
        mask = make_padding_mask(lengths, tokens.shape[1])
        embed = nn.Embed(self.vocab_size, self.embed_dim)(tokens)
        rnn_cls = BiGRU if self.rnn.upper() == "GRU" else BiLSTM
        rnn_out = rnn_cls(
            hidden_size=self.hidden_size, num_layers=2, dropout=self.rnn_dropout
        )(embed, mask, deterministic=deterministic)
        h = nn.relu(nn.Dense(self.hidden_size)(rnn_out))
        return jnp.tanh(
            PrincipalComponentsPredictor(num_components=latent)(h)
        )


def make_latent_rnn_synthesis_forward(
    rnn_model,
    rnn_params,
    decoder_model,
    decoder_params,
    denorm_mean,
    denorm_std,
    n_samples: int = 50,
    rescale_factor: float = 1.0,
    decode_fn=None,
):
    """Synthesis wrapper: rnn -> frozen decoder -> reshape -> denorm
    (reference models/__init__.py:20-43).

    Args:
        denorm_mean/denorm_std: (Nart, 2, n_samples) per-articulator stats.
        decode_fn: optional prebuilt frozen decoder closure; otherwise built
            from (decoder_model, decoder_params).
    Returns forward(tokens, lengths) -> (B, T, Nart, 2, n_samples).
    """
    if decode_fn is None:
        def decode_fn(z):
            return decoder_model.apply({"params": decoder_params}, z)

    d = int(jnp.asarray(denorm_mean).shape[-1]) if denorm_mean is not None else n_samples

    def forward(tokens, lengths):
        latents = rnn_model.apply({"params": rnn_params}, tokens, lengths)
        shapes = decode_fn(rescale_factor * latents)  # (B, T, Nart, 2*D)
        b, t, n_art, _ = shapes.shape
        shapes = shapes.reshape(b, t, n_art, 2, d)
        if denorm_mean is None:
            return shapes
        return shapes * denorm_std + denorm_mean

    return forward
