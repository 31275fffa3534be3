"""Multi-channel transformer for phoneme-to-articulation (method D).

Equivalent of reference phoneme_to_articulation/transformer/models.py:9-474
(``PositionalEncoding``, ``ChannelProcessingLayer``, ``ChannelInteractionsLayer``,
``MultiChannelTransformerDecoderLayer``, ``ArtSpeechTransformer``), redesigned
TPU-first:

- the per-channel / per-channel-pair ``nn.ModuleList`` loops become ``nn.vmap``
  lifts with stacked parameters on a leading channel axis — one batched
  attention instead of Nart (and Nart*(Nart-1)) sequential MHA calls, and the
  natural tensor-parallel sharding axis;
- autoregressive ``generate`` is a ``lax.scan`` over a fixed-length target
  buffer with a causal mask (static shapes, no Python loop, no NaN filtering —
  the reference's generate loop re-decodes a growing sequence per step,
  transformer/models.py:391-427);
- masks are built in-graph from lengths instead of collate-time -inf tensors.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.models.heads import ArticulatorPredictor
from artspeech_tpu.utils.masks import make_padding_mask


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """(max_len, dim) sinusoidal table (reference models.py:9-34)."""
    position = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, dim, 2).astype(jnp.float32) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class PositionalEncoding(nn.Module):
    dropout: float = 0.0
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t, d = x.shape[-2], x.shape[-1]
        x = x + sinusoidal_positions(self.max_len, d)[:t]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ChannelProcessingLayer(nn.Module):
    """LN -> Q/K/V MLPs -> MHA -> query residual (reference models.py:37-100).

    The reference applies the SAME LayerNorm to src and tgt; kept here.
    With ``decode=True`` the attention maintains a KV cache (flax decode
    machinery): initialize with full-length inputs, then step with length-1
    queries — causality comes from the cache index, no mask needed.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    decode: bool = False

    @nn.compact
    def __call__(self, src, tgt, mask=None, deterministic: bool = True):
        """
        Args:
            src: (..., S, E) keys/values source.
            tgt: (..., L, E) queries source.
            mask: broadcastable to (..., num_heads, L, S) boolean, True=keep.
        """
        ln = nn.LayerNorm()
        src = ln(src)
        tgt = ln(tgt)
        query = nn.relu(nn.Dense(self.embed_dim)(tgt))
        key = nn.relu(nn.Dense(self.embed_dim)(src))
        value = nn.relu(nn.Dense(self.embed_dim)(src))
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            decode=self.decode,
        )(query, key, value, mask=None if self.decode else mask)
        return query + out


class ChannelInteractionsLayer(nn.Module):
    """Each channel cross-attends every OTHER channel, concat + linear
    (reference models.py:103-162), with the per-target-channel layers
    vmapped over a stacked (Nother,) parameter axis."""

    embed_dim: int
    num_heads: int
    num_tgt_channels: int
    dropout: float = 0.0
    decode: bool = False

    @nn.compact
    def __call__(self, src_channel, tgt_channels, mask=None, deterministic=True):
        """
        Args:
            src_channel: (B, L, E); tgt_channels: (B, Nother, L, E).
        """
        drop = nn.Dropout(self.dropout)
        src = drop(src_channel, deterministic=deterministic)
        tgts = drop(tgt_channels, deterministic=deterministic)

        # deterministic passed POSITIONALLY: nn.vmap drops kwargs silently.
        vmapped = nn.vmap(
            ChannelProcessingLayer,
            in_axes=(None, 1, None, None),
            out_axes=1,
            axis_size=self.num_tgt_channels,
            variable_axes={"params": 0, "cache": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout, self.decode)
        outs = vmapped(src, tgts, mask, deterministic)
        # (B, Nother, L, E) -> concat channels (B, L, Nother * E)
        b, n, l, e = outs.shape
        concat = jnp.swapaxes(outs, 1, 2).reshape(b, l, n * e)
        concat = drop(concat, deterministic=deterministic)
        h = nn.LayerNorm()(concat)
        return nn.relu(nn.Dense(self.embed_dim)(h))


class MultiChannelDecoderLayer(nn.Module):
    """Self per channel -> cross-channel -> cross-memory -> FF
    (reference models.py:165-277). All per-channel layers are vmapped."""

    embed_dim: int
    num_heads: int
    num_channels: int
    dropout: float = 0.0
    decode: bool = False

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, C, L, E)
        memory,  # (B, S, E)
        tgt_mask=None,  # (B, 1, L, L) bool
        memory_mask=None,  # (B, 1, L, S) bool
        deterministic: bool = True,
    ):
        drop = nn.Dropout(self.dropout)
        c = self.num_channels

        # 1. per-channel causal self attention
        self_vmapped = nn.vmap(
            ChannelProcessingLayer,
            in_axes=(1, 1, None, None),
            out_axes=1,
            axis_size=c,
            variable_axes={"params": 0, "cache": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout, self.decode)
        tgt_d = drop(tgt, deterministic=deterministic)
        proc = self_vmapped(tgt_d, tgt_d, tgt_mask, deterministic)

        # 2. cross-channel interactions, vmapped over the source channel.
        # For channel i the "others" are proc without row i: build via a
        # static gather index (C, C-1).
        others_idx = jnp.asarray(
            [[j for j in range(c) if j != i] for i in range(c)]
        )  # (C, C-1)
        others = proc[:, others_idx]  # (B, C, C-1, L, E)
        inter_vmapped = nn.vmap(
            ChannelInteractionsLayer,
            in_axes=(1, 1, None, None),
            out_axes=1,
            axis_size=c,
            variable_axes={"params": 0, "cache": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, c - 1, self.dropout, self.decode)
        proc_d = drop(proc, deterministic=deterministic)
        others_d = drop(others, deterministic=deterministic)
        inter = inter_vmapped(proc_d, others_d, tgt_mask, deterministic)

        # 3. cross attention to encoder memory, per channel
        mem_vmapped = nn.vmap(
            ChannelProcessingLayer,
            in_axes=(None, 1, None, None),
            out_axes=1,
            axis_size=c,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout)
        mem_d = drop(memory, deterministic=deterministic)
        inter_d = drop(inter, deterministic=deterministic)
        attended = mem_vmapped(mem_d, inter_d, memory_mask, deterministic)

        attended = nn.LayerNorm()(attended)
        h = nn.LayerNorm()(drop(attended, deterministic=deterministic))
        ff = nn.relu(nn.Dense(self.embed_dim)(h))
        return attended + ff


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch nn.TransformerEncoderLayer defaults:
    ReLU, dim_feedforward configurable)."""

    embed_dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(x, x, x, mask=mask)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(attn, deterministic=deterministic))
        ff = nn.Dense(self.ff_dim)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.embed_dim)(ff)
        return nn.LayerNorm()(x + nn.Dropout(self.dropout)(ff, deterministic=deterministic))


class ArtSpeechTransformer(nn.Module):
    """Token encoder + multi-channel decoder + per-articulator predictors
    (reference models.py:280-474).

    Initialize via the teacher-forced ``__call__`` (it touches every layer);
    ``generate`` then runs under ``apply(..., method=ArtSpeechTransformer.generate)``
    with the same parameters (no param creation inside the scan).
    """

    vocab_size: int
    num_articulators: int
    embed_dim: int = 64
    num_heads: int = 4
    num_layers: int = 4
    num_feat: int = 100  # 2 * n_samples
    dropout: float = 0.0
    encoder_ff_dim: int = 2048
    decode: bool = False  # KV-cached incremental decoding (fast_generate)

    def setup(self):
        self.src_embedding = nn.Embed(self.vocab_size, self.embed_dim)
        self.pos_encoding = PositionalEncoding(self.dropout)
        self.tgt_pos_encoding = PositionalEncoding(self.dropout)
        self.encoder_layers = [
            TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.encoder_ff_dim, self.dropout
            )
            for _ in range(self.num_layers)
        ]
        self.decoder_layers = [
            MultiChannelDecoderLayer(
                self.embed_dim,
                self.num_heads,
                self.num_articulators,
                self.dropout,
                decode=self.decode,
            )
            for _ in range(self.num_layers)
        ]
        self.tgt_embed_ln = nn.LayerNorm()
        self.tgt_embed_dense = nn.Dense(self.embed_dim)
        self.head_ln = nn.LayerNorm()
        self.head_dense = nn.Dense(self.embed_dim)
        self.predictors = nn.vmap(
            ArticulatorPredictor,
            in_axes=None,
            out_axes=2,
            axis_size=self.num_articulators,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(n_samples=self.num_feat // 2)

    def _encode(self, src, src_mask, deterministic):
        embed = self.src_embedding(src)
        h = self.pos_encoding(embed, deterministic=deterministic)
        enc_mask = None
        if src_mask is not None:
            enc_mask = src_mask[:, None, None, :]  # keys masked
        for layer in self.encoder_layers:
            h = layer(h, mask=enc_mask, deterministic=deterministic)
        return h

    def _decode(self, tgt, memory, tgt_mask, memory_mask, deterministic):
        """tgt: (B, L, C, F) -> (B, L, C, 2, D) sigmoid contours."""
        b, l, c, f = tgt.shape
        h = self.tgt_embed_ln(tgt)
        h = nn.relu(self.tgt_embed_dense(h))
        h = jnp.transpose(h, (0, 2, 1, 3))  # (B, C, L, E)
        h = self.tgt_pos_encoding(h, deterministic=deterministic)
        for layer in self.decoder_layers:
            h = layer(h, memory, tgt_mask, memory_mask, deterministic=deterministic)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, l, c * self.embed_dim)
        h = self.head_ln(h)
        h = nn.relu(self.head_dense(h))
        return nn.sigmoid(self.predictors(h))  # (B, L, C, 2, D)

    def __call__(
        self,
        src,
        tgt,
        src_lengths=None,
        tgt_lengths=None,
        deterministic: bool = True,
    ):
        """Teacher-forced forward.

        Args:
            src: (B, S) token ids; tgt: (B, L, C, F) right-shifted targets.
        Returns:
            (B, L, C, 2, D).
        """
        b, s = src.shape
        l = tgt.shape[1]
        src_mask = (
            make_padding_mask(src_lengths, s) if src_lengths is not None else None
        )
        memory = self._encode(src, src_mask, deterministic)

        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        tgt_mask = causal
        if tgt_lengths is not None:
            tgt_pad = make_padding_mask(tgt_lengths, l)
            tgt_mask = causal & tgt_pad[:, None, None, :]
        memory_mask = (
            src_mask[:, None, None, :] if src_mask is not None else None
        )
        return self._decode(tgt, memory, tgt_mask, memory_mask, deterministic)

    def encode(self, src, src_lengths=None):
        """Expose the encoder memory (for the cached fast-generate loop)."""
        src_mask = (
            make_padding_mask(src_lengths, src.shape[1])
            if src_lengths is not None
            else None
        )
        memory = self._encode(src, src_mask, True)
        memory_mask = src_mask[:, None, None, :] if src_mask is not None else None
        return memory, memory_mask

    def decode_step(self, prev_frame, t, memory, memory_mask=None):
        """One KV-cached decoding step (requires decode=True + a mutable
        "cache" collection initialized at full length).

        Args:
            prev_frame: (B, C, F) previous output frame (zeros at t=0).
            t: scalar position index (for the positional encoding).
        Returns:
            (B, C, F) next frame.
        """
        b, c, f = prev_frame.shape
        h = self.tgt_embed_ln(prev_frame[:, None])  # (B, 1, C, F)
        h = nn.relu(self.tgt_embed_dense(h))
        h = jnp.transpose(h, (0, 2, 1, 3))  # (B, C, 1, E)
        pe = jax.lax.dynamic_index_in_dim(
            sinusoidal_positions(5000, self.embed_dim), t, keepdims=False
        )
        h = h + pe
        for layer in self.decoder_layers:
            h = layer(h, memory, None, memory_mask, deterministic=True)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, 1, c * self.embed_dim)
        h = self.head_ln(h)
        h = nn.relu(self.head_dense(h))
        out = nn.sigmoid(self.predictors(h))  # (B, 1, C, 2, D)
        return out[:, 0].reshape(b, c, f)

    def generate(self, src, src_lengths=None):
        """Autoregressive generation from a zero start token via lax.scan
        (reference models.py:391-427, without per-step re-allocation).

        Returns (B, S, C, 2, D).
        """
        b, s = src.shape
        c, f = self.num_articulators, self.num_feat
        src_mask = (
            make_padding_mask(src_lengths, s) if src_lengths is not None else None
        )
        memory = self._encode(src, src_mask, True)
        memory_mask = src_mask[:, None, None, :] if src_mask is not None else None

        buf_len = s + 1
        causal = jnp.tril(jnp.ones((buf_len, buf_len), bool))[None, None]

        def step(tgt_buf, t):
            out = self._decode(tgt_buf, memory, causal, memory_mask, True)
            # (B, L, C, 2, D) -> flat next frame at position t
            next_frame = out[:, t].reshape(b, c, f)
            tgt_buf = jax.lax.dynamic_update_slice_in_dim(
                tgt_buf, next_frame[:, None], t + 1, axis=1
            )
            return tgt_buf, None

        tgt0 = jnp.zeros((b, buf_len, c, f))
        tgt_buf, _ = jax.lax.scan(step, tgt0, jnp.arange(s))
        return tgt_buf[:, 1:].reshape(b, s, c, 2, f // 2)


def make_fast_generate(model: ArtSpeechTransformer, max_len: int):
    """KV-cached autoregressive generation (flax decode-cache pattern).

    The method-based ``generate`` re-decodes the full buffer every step
    (O(T^2) attention per step, O(T^3) total). This builds a sampler that
    steps the decoder with length-1 queries against per-layer KV caches —
    O(T) steps of O(T) attention.

    Measured tradeoff on v5e (B=4, 2 layers, 11 channels): the cached path
    breaks even around T=128 (363ms vs 423ms) and only wins for longer
    sequences — at thesis sentence lengths the full-buffer ``generate``
    keeps the MXU busier than 11-channel length-1 queries. Both paths are
    numerically equivalent per step (CPU parity to 1e-4); autoregressive
    feedback amplifies bf16 matmul noise identically in either.

    Args:
        model: the TEACHER-FORCED model definition (decode=False); parameters
            are shared, the decode twin is built internally.
        max_len: cache capacity (>= the longest sequence to generate).
    Returns:
        fast_generate(params, src, src_lengths) -> (B, S, C, 2, D); jit it.
    """
    decode_model = model.clone(decode=True)
    c, f = model.num_articulators, model.num_feat

    def fast_generate(params, src, src_lengths=None):
        b, s = src.shape
        memory, memory_mask = model.apply(
            {"params": params}, src, src_lengths, method=ArtSpeechTransformer.encode
        )
        # Initialize per-layer KV caches at full length: an init-mode pass
        # through decode=True layers creates "cache" vars sized to the input.
        cache = decode_model.init(
            jax.random.PRNGKey(0),
            src,
            jnp.zeros((b, max_len, c, f), memory.dtype),
            jnp.full((b,), max_len, jnp.int32),
            jnp.full((b,), max_len, jnp.int32),
        )["cache"]

        def step(carry, t):
            cache, prev = carry
            nxt, vars_out = decode_model.apply(
                {"params": params, "cache": cache},
                prev,
                t,
                memory,
                memory_mask,
                method=ArtSpeechTransformer.decode_step,
                mutable=["cache"],
            )
            return (vars_out["cache"], nxt), nxt

        prev0 = jnp.zeros((b, c, f), memory.dtype)
        (_, _), frames = jax.lax.scan(step, (cache, prev0), jnp.arange(s))
        # frames: (S, B, C, F) -> (B, S, C, 2, D)
        frames = jnp.transpose(frames, (1, 0, 2, 3))
        return frames.reshape(b, s, c, 2, f // 2)

    return fast_generate
