"""ArtSpeech: the model-free BiGRU phoneme-to-articulation model.

Equivalent of reference encoder_decoder/models.py:53-145 (``ArtSpeech`` and
``SimpleArtSpeech``): Embedding -> 2-layer BiGRU -> Linear+ReLU -> vmapped
per-articulator heads -> sigmoid, producing (B, T, Nart, 2, n_samples).
Sequences are padded to bucketed static lengths with a boolean mask instead
of pack_padded_sequence.
"""

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.ops.gru import BiGRU
from artspeech_tpu.models.heads import ContourDecoder
from artspeech_tpu.utils.masks import make_padding_mask


class ArtSpeech(nn.Module):
    vocab_size: int
    n_articulators: int
    embed_dim: int = 64
    hidden_size: int = 128
    n_samples: int = 50
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    fuse_gru_directions: Optional[bool] = None  # None = auto by batch (ops/gru.py)

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        """
        Args:
            tokens: (B, T) int32 token ids (padded).
            lengths: (B,) int32 valid lengths.
        Returns:
            (B, T, Nart, 2, n_samples) contours in [0, 1].
        """
        mask = make_padding_mask(lengths, tokens.shape[1])
        embed = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)(tokens)
        rnn_out = BiGRU(
            hidden_size=self.hidden_size,
            num_layers=2,
            dropout=self.dropout,
            dtype=self.dtype,
            fuse_directions=self.fuse_gru_directions,
        )(embed, mask, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype)(rnn_out)
        h = nn.relu(h)
        return ContourDecoder(
            n_articulators=self.n_articulators,
            n_samples=self.n_samples,
            dtype=self.dtype,
        )(h)


class SimpleArtSpeech(nn.Module):
    """RNN-free variant (reference encoder_decoder/models.py:53-96)."""

    vocab_size: int
    n_articulators: int
    embed_dim: int = 64
    hidden_size: int = 128
    n_samples: int = 50
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        del lengths
        embed = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)(tokens)
        embed = nn.Dropout(rate=self.dropout)(embed, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype)(embed)
        h = nn.relu(h)
        return ContourDecoder(
            n_articulators=self.n_articulators,
            n_samples=self.n_samples,
            dtype=self.dtype,
        )(h)
