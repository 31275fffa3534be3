"""Mask-aware GRU layers built on lax.scan.

TPU-native replacement for torch ``nn.GRU`` + ``pack_padded_sequence``
(reference encoder_decoder/models.py:111,136-138): instead of packing,
sequences stay padded at fixed (bucketed) lengths and the recurrence is
masked — the hidden state freezes outside the valid region. The input
projection for all timesteps is hoisted out of the scan into one large
(B*T, E) x (E, 3H) matmul that maps onto the MXU; only the (B, H) x (H, 3H)
hidden projection stays inside the scan.

Gate math follows torch semantics:
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.ops import pallas_gru


def torch_rnn_init(hidden_size: int):
    """torch nn.GRU/nn.LSTM initialization: every parameter ~ U(-k, k) with
    k = 1/sqrt(hidden_size). flax's ``initializers.uniform(scale)`` samples
    [0, scale) — all-positive — which biases gates toward saturation."""
    bound = 1.0 / (hidden_size**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GRULayer(nn.Module):
    """Single-direction masked GRU over (B, T, E) -> (B, T, H).

    With ``project_only=True`` the call declares the same parameters but
    returns the hoisted pieces ``(x_proj, w_h, b_h, mask)`` (already
    direction-reversed) instead of running the scan — used by ``BiGRU`` to
    fuse both directions into one scan without changing the param tree.
    """

    hidden_size: int
    reverse: bool = False
    dtype: Optional[jnp.dtype] = None
    project_only: bool = False
    time_major: bool = False

    @nn.compact
    def __call__(self, x, mask):
        """
        Args:
            x: (B, T, E) inputs — or (T, B, E) with ``time_major=True``.
            mask: (B, T) bool (or (T, B) time-major); True on valid steps.
        Returns:
            (B, T, H) (or (T, B, H)) outputs. At padded positions the carry
            is frozen, so outputs there repeat the last valid hidden state;
            every masked consumer ignores them (valid-region outputs match
            torch pack_padded exactly — see tests/test_gru_torch_parity.py).
        """
        in_features = x.shape[-1]
        hidden = self.hidden_size
        dtype = self.dtype or x.dtype

        init = torch_rnn_init(hidden)
        w_i = self.param("wi", init, (in_features, 3 * hidden))
        b_i = self.param("bi", init, (3 * hidden,))
        w_h = self.param("wh", init, (hidden, 3 * hidden))
        b_h = self.param("bh", init, (3 * hidden,))

        # One big MXU matmul for every timestep's input projection.
        x_proj = x.astype(dtype) @ w_i.astype(dtype) + b_i.astype(dtype)

        w_h_c = w_h.astype(dtype)
        b_h_c = b_h.astype(dtype)

        if self.time_major:
            # Zero-relayout path: the scan consumes the leading (time) axis
            # directly and the reverse direction traverses via
            # scan(reverse=True) instead of flipping data. Numerics are
            # identical to the batch-major path; only copies disappear.
            t, b = x_proj.shape[0], x_proj.shape[1]
            if pallas_gru.supported(t, b, hidden):
                # Fused Pallas time-loop: the whole recurrence runs in one
                # Mosaic program with w_h resident in VMEM (measured 5x
                # fwd+bwd over the scan at B=256 T=128 H=128 f32 —
                # benchmarks/BENCH_DETAILS.md).
                return pallas_gru.gru_sequence(
                    x_proj, w_h_c, b_h_c, mask.astype(x_proj.dtype),
                    reverse=self.reverse,
                )
            return _gru_scan(
                x_proj, w_h_c, b_h_c, mask, hidden,
                time_major=True, reverse=self.reverse,
            )

        if self.reverse:
            x_proj = x_proj[:, ::-1]
            mask = mask[:, ::-1]

        if self.project_only:
            return x_proj, w_h_c, b_h_c, mask

        ys = _gru_scan(x_proj, w_h_c, b_h_c, mask, hidden)
        if self.reverse:
            ys = ys[:, ::-1]
        return ys


def _gru_scan(x_proj, w_h, b_h, mask, hidden, time_major=False, reverse=False):
    """Masked GRU recurrence over hoisted input projections.

    Batch-polymorphic: leading axes of ``x_proj``/``mask``/``w_h`` may carry
    an extra direction axis (w_h (D, H, 3H) with x_proj (D, B, T, 3H)) —
    the matmul becomes a batched einsum either way.

    With ``time_major=True``, ``x_proj`` is (T, ..., 3H) / ``mask`` (T, ...)
    and the scan consumes the leading axis with no moveaxis copies in or
    out; ``reverse=True`` walks time backward (outputs still stacked in
    forward index order), replacing explicit data flips.
    """
    batch_shape = x_proj.shape[1:-1] if time_major else x_proj.shape[:-2]

    def matmul(h, w):
        if w.ndim == 2:
            return h @ w
        return jnp.einsum("d...h,dhg->d...g", h, w)

    b_b = b_h if b_h.ndim == 1 else b_h[:, None, :]

    def step(h, inputs):
        xg, m = inputs  # (..., 3H), (...,)
        hg = matmul(h, w_h) + b_b
        r = jax.nn.sigmoid(xg[..., :hidden] + hg[..., :hidden])
        z = jax.nn.sigmoid(xg[..., hidden : 2 * hidden] + hg[..., hidden : 2 * hidden])
        n = jnp.tanh(xg[..., 2 * hidden :] + r * hg[..., 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(m[..., None], h_new, h)
        return h_new, h_new

    h0 = jnp.zeros(batch_shape + (hidden,), x_proj.dtype)
    if time_major:
        xs = (x_proj, mask)
    else:
        xs = (jnp.moveaxis(x_proj, -2, 0), jnp.moveaxis(mask, -1, 0))
    # unroll=8: each while iteration on TPU pays ~5us of fixed per-op cost
    # across the ~8 fused gate ops; unrolling fuses 8 timesteps into one
    # loop body (measured 14x fwd+bwd on the isolated recurrence at the
    # thesis batch, 1.16x at B=256; unroll=16 regresses both).
    _, ys = jax.lax.scan(step, h0, xs, unroll=8, reverse=reverse)
    if time_major:
        return ys  # (T, ..., H)
    return jnp.moveaxis(ys, 0, -2)  # (..., T, H)


class BiGRU(nn.Module):
    """Stacked bidirectional GRU: (B, T, E) -> (B, T, 2H).

    Equivalent of ``nn.GRU(num_layers=N, bidirectional=True)`` as used by the
    reference ArtSpeech (encoder_decoder/models.py:111). Inter-layer dropout
    matches torch (applied to each layer's output except the last).
    """

    hidden_size: int
    num_layers: int = 2
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    #: None = auto: fuse both directions into ONE scan (stacked direction
    #: axis, batched einsum recurrence) for small batches, where per-scan
    #: fixed costs dominate; keep XLA's overlapped twin scans for large
    #: batches, where the wider fused matmul serializes worse. Interleaved
    #: paired timing on v5e at the thesis batch (B=12, T=128): median 1.11x
    #: full-train-step speedup, noise-limited (tunnel throughput drifts
    #: +/-50% run-to-run); at B=256 twin scans measured ahead. Threshold
    #: B<=16 covers the thesis batch. The param tree is identical either
    #: way (GRULayer declares its params in project_only mode).
    fuse_directions: Optional[bool] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        fuse = self.fuse_directions
        if fuse is None:
            fuse = x.shape[0] <= 16
        if fuse:
            out = x
            for layer in range(self.num_layers):
                xp_f, wh_f, bh_f, mask_f = GRULayer(
                    self.hidden_size, reverse=False, dtype=self.dtype,
                    project_only=True,
                )(out, mask)
                xp_b, wh_b, bh_b, mask_b = GRULayer(
                    self.hidden_size, reverse=True, dtype=self.dtype,
                    project_only=True,
                )(out, mask)
                ys = _gru_scan(
                    jnp.stack([xp_f, xp_b]),
                    jnp.stack([wh_f, wh_b]),
                    jnp.stack([bh_f, bh_b]),
                    jnp.stack([mask_f, mask_b]),
                    self.hidden_size,
                )  # (2, B, T, H)
                out = jnp.concatenate([ys[0], ys[1][:, ::-1]], axis=-1)
                if self.dropout > 0.0 and layer < self.num_layers - 1:
                    out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
            return out

        # Large batches: time-major internal layout. One small transpose in
        # ((B, T, E) -> (T, B, E)) and one out replace per-layer moveaxis of
        # the (B, T, 3H) projections + explicit flips for the reverse
        # direction — the scan consumes the leading axis directly and the
        # backward pass reuses the same layout (measured ~5ms of relayout
        # copies in the b256 train step, benchmarks/BENCH_DETAILS.md).
        out = jnp.swapaxes(x, 0, 1)
        mask_tm = jnp.swapaxes(mask, 0, 1)
        for layer in range(self.num_layers):
            fwd = GRULayer(self.hidden_size, reverse=False, dtype=self.dtype,
                           time_major=True)(out, mask_tm)
            bwd = GRULayer(self.hidden_size, reverse=True, dtype=self.dtype,
                           time_major=True)(out, mask_tm)
            out = jnp.concatenate([fwd, bwd], axis=-1)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return jnp.swapaxes(out, 0, 1)


class GRUStack(nn.Module):
    """Stacked unidirectional GRU: (B, T, E) -> (B, T, H)."""

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # Time-major internal layout (see BiGRU): the scans consume the
        # leading axis directly, replacing per-layer moveaxis copies with
        # one small transpose in and one out.
        out = jnp.swapaxes(x, 0, 1)
        mask_tm = jnp.swapaxes(mask, 0, 1)
        for layer in range(self.num_layers):
            out = GRULayer(self.hidden_size, dtype=self.dtype,
                           time_major=True)(out, mask_tm)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return jnp.swapaxes(out, 0, 1)


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM (RNNType.LSTM option of the latent
    sequence model, reference phoneme_to_articulation/__init__.py:47-49).

    ``fuse_directions`` as in :class:`BiGRU` (None = auto by batch size).
    """

    hidden_size: int
    num_layers: int = 2
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    fuse_directions: Optional[bool] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        fuse = self.fuse_directions
        if fuse is None:
            fuse = x.shape[0] <= 16
        if fuse:
            out = x
            for layer in range(self.num_layers):
                xp_f, wh_f, bh_f, mask_f = LSTMLayer(
                    self.hidden_size, reverse=False, dtype=self.dtype,
                    project_only=True,
                )(out, mask)
                xp_b, wh_b, bh_b, mask_b = LSTMLayer(
                    self.hidden_size, reverse=True, dtype=self.dtype,
                    project_only=True,
                )(out, mask)
                ys = _lstm_scan(
                    jnp.stack([xp_f, xp_b]),
                    jnp.stack([wh_f, wh_b]),
                    jnp.stack([bh_f, bh_b]),
                    jnp.stack([mask_f, mask_b]),
                    self.hidden_size,
                )  # (2, B, T, H)
                out = jnp.concatenate([ys[0], ys[1][:, ::-1]], axis=-1)
                if self.dropout > 0.0 and layer < self.num_layers - 1:
                    out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
            return out

        # Time-major internal layout for large batches (see BiGRU).
        out = jnp.swapaxes(x, 0, 1)
        mask_tm = jnp.swapaxes(mask, 0, 1)
        for layer in range(self.num_layers):
            fwd = LSTMLayer(self.hidden_size, reverse=False, dtype=self.dtype,
                            time_major=True)(out, mask_tm)
            bwd = LSTMLayer(self.hidden_size, reverse=True, dtype=self.dtype,
                            time_major=True)(out, mask_tm)
            out = jnp.concatenate([fwd, bwd], axis=-1)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return jnp.swapaxes(out, 0, 1)


class LSTMLayer(nn.Module):
    """Single-direction masked LSTM (torch gate order i, f, g, o).

    ``project_only`` as in :class:`GRULayer`: declare the same params but
    return the hoisted ``(x_proj, w_h, b_h, mask)`` for a direction-fused
    scan in the parent.
    """

    hidden_size: int
    reverse: bool = False
    dtype: Optional[jnp.dtype] = None
    project_only: bool = False
    time_major: bool = False

    @nn.compact
    def __call__(self, x, mask):
        in_features = x.shape[-1]
        hidden = self.hidden_size
        dtype = self.dtype or x.dtype

        init = torch_rnn_init(hidden)
        w_i = self.param("wi", init, (in_features, 4 * hidden))
        b_i = self.param("bi", init, (4 * hidden,))
        w_h = self.param("wh", init, (hidden, 4 * hidden))
        b_h = self.param("bh", init, (4 * hidden,))

        x_proj = x.astype(dtype) @ w_i.astype(dtype) + b_i.astype(dtype)

        w_h_c = w_h.astype(dtype)
        b_h_c = b_h.astype(dtype)

        if self.time_major:
            t, b = x_proj.shape[0], x_proj.shape[1]
            if pallas_gru.supported(t, b, hidden, gates=4):
                # Fused Pallas time-loop (see GRULayer / ops/pallas_gru.py).
                return pallas_gru.lstm_sequence(
                    x_proj, w_h_c, b_h_c, mask.astype(x_proj.dtype),
                    reverse=self.reverse,
                )
            return _lstm_scan(
                x_proj, w_h_c, b_h_c, mask, hidden,
                time_major=True, reverse=self.reverse,
            )

        if self.reverse:
            x_proj = x_proj[:, ::-1]
            mask = mask[:, ::-1]

        if self.project_only:
            return x_proj, w_h_c, b_h_c, mask

        ys = _lstm_scan(x_proj, w_h_c, b_h_c, mask, hidden)
        if self.reverse:
            ys = ys[:, ::-1]
        return ys


def _lstm_scan(x_proj, w_h, b_h, mask, hidden, time_major=False, reverse=False):
    """Masked LSTM recurrence over hoisted input projections; leading axes
    may carry a direction axis exactly as in :func:`_gru_scan`, and
    ``time_major``/``reverse`` behave the same."""
    batch_shape = x_proj.shape[1:-1] if time_major else x_proj.shape[:-2]

    def matmul(h, w):
        if w.ndim == 2:
            return h @ w
        return jnp.einsum("d...h,dhg->d...g", h, w)

    b_b = b_h if b_h.ndim == 1 else b_h[:, None, :]

    def step(carry, inputs):
        h, c = carry
        xg, m = inputs
        gates = xg + matmul(h, w_h) + b_b
        i = jax.nn.sigmoid(gates[..., :hidden])
        f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = m[..., None]
        h_new = jnp.where(keep, h_new, h)
        c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    h0 = jnp.zeros(batch_shape + (hidden,), x_proj.dtype)
    if time_major:
        xs = (x_proj, mask)
    else:
        xs = (jnp.moveaxis(x_proj, -2, 0), jnp.moveaxis(mask, -1, 0))
    (_, _), ys = jax.lax.scan(step, (h0, h0), xs, unroll=8, reverse=reverse)
    if time_major:
        return ys
    return jnp.moveaxis(ys, 0, -2)
