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
import numpy as np
import flax.linen as nn

from artspeech_tpu.models.heads import ArticulatorPredictor
from artspeech_tpu.ops import pallas_attention, pallas_train_attention
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
        # keep the caller's compute dtype: adding the f32 table would
        # silently promote bf16 activations back to f32
        x = x + sinusoidal_positions(self.max_len, d)[:t].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _LayerNormParams(nn.Module):
    """Parameter bag matching ``nn.LayerNorm``'s tree ({scale, bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Parameter bag matching ``nn.Dense``'s tree ({kernel, bias})."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
            ),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


def _norm_f32(x):
    """flax LayerNorm statistics (f32, fast variance), no affine."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    # flax clamps the fast variance at 0 (nn.normalization._compute_stats):
    # float cancellation on a near-constant row can make E[x^2]-E[x]^2
    # negative beyond the epsilon, and rsqrt(negative) would be NaN.
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    )
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-6)


def lean_attention(query, key, value, bias=None, mask=None,
                   broadcast_dropout=True, dropout_rng=None,
                   dropout_rate=0.0, deterministic=False, dtype=None,
                   precision=None):
    """``nn.dot_product_attention`` with the softmax normalizer folded into
    the OUTPUT: ``o = (exp(s-m) * keep) @ v / (z * keep_prob)``.

    The normalized-probabilities tensor — for the decoder's cross-channel
    attention a (B, C, C-1, H, L, L) array, ~283MB at the bench shape — is
    never materialized, saving one full score-sized write + read per
    attention in the forward AND the corresponding normalize-backward passes
    in the VJP. Measured on one MultiChannelDecoderLayer fwd+bwd (v5e, B=12,
    T=128, C=10): 5.72 -> 5.15 ms device (benchmarks/NOTES.md "Lean
    attention").

    Numerics: identical to flax's ``dot_product_attention`` up to float
    reassociation of the 1/z divide (the same contract as the folded
    LayerNorm affines above) — max |delta| 1.1e-6 on CPU f32 where the torch
    golden tests run; on TPU the default bf16-MXU matmul precision makes the
    reassociation visible at ~1e-2 absolute, the same noise class as any
    re-fusion at that precision. Dropout semantics match flax exactly
    (broadcast over batch AND head dims, applied to the probabilities —
    folding the keep-mask into the unnormalized weights and ``keep_prob``
    into the output scale is exact).
    """
    dtype = dtype or jnp.promote_types(query.dtype, jnp.float32)
    hd = query.shape[-1]
    s = jnp.einsum(
        "...qhd,...khd->...hqk",
        (query / math.sqrt(hd)).astype(dtype),
        key.astype(dtype),
        precision=precision,
    )
    if bias is not None:
        s = s + bias
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)  # (..., h, q, 1)
    scale = 1.0
    if not deterministic and dropout_rate > 0.0:
        keep_prob = 1.0 - dropout_rate
        if broadcast_dropout:
            # flax broadcasts over batch AND head dims: [1]*(key.ndim-2)+(q,k)
            shape = tuple([1] * (e.ndim - 2)) + e.shape[-2:]
            keep = jax.random.bernoulli(dropout_rng, keep_prob, shape)
        else:
            keep = jax.random.bernoulli(dropout_rng, keep_prob, e.shape)
        e = e * keep.astype(e.dtype)
        scale = keep_prob
    o = jnp.einsum(
        "...hqk,...khd->...qhd", e, value.astype(e.dtype), precision=precision
    )
    return o / (jnp.swapaxes(z, -3, -2) * scale)  # z -> (..., q, h, 1)


def _expand_others(proc, c):
    """(B, C, ...) -> (B, C, C-1, ...): row (i, j) is channel ``j`` skipping
    ``i`` — the "every other channel" expansion of the cross-channel
    interactions (reference models.py:236-249 builds it by list indexing).

    Two exact implementations, dispatched by the measured crossover (v5e,
    interleaved A/B medians, T=128 C=10 train step fwd+bwd): the fancy-index
    gather (a serial while loop on TPU, scatter-add VJP) wins at the thesis
    batch (22.56 vs 23.73ms at B=12) and in the per-step decode body; the
    one-hot contraction (one bandwidth-bound pass each way) wins once the
    while loop's serial cost outgrows the extra contraction passes (187.1 ->
    183.1ms at B=64). precision=highest keeps the one-hot path exact in every
    dtype (each output element is value*1 summed with true zeros; the
    TPU-default single bf16 pass would round f32 values).
    """
    idx = np.asarray([[j for j in range(c) if j != i] for i in range(c)])
    if proc.shape[0] < 64:
        return proc[:, jnp.asarray(idx)]
    onehot = jnp.asarray(
        idx[:, :, None] == np.arange(c)[None, None, :], proc.dtype
    )  # (C, C-1, C)
    return jnp.einsum("cjx,bx...->bcj...", onehot, proc, precision="highest")


class ChannelProcessingLayer(nn.Module):
    """LN -> Q/K/V MLPs -> MHA -> query residual (reference models.py:37-100).

    The reference applies the SAME LayerNorm to src and tgt; kept here.

    The LayerNorm affine is FOLDED into the Q/K/V MLP kernels at apply time
    (``relu((x_n*s + b) @ W + c) == relu(x_n @ (s[:,None]*W) + (b@W + c))``;
    parameter tree and numerics unchanged up to float reassociation — the
    torch golden test tests/test_transformer_torch_parity.py pins both).
    Why: every instance of this layer runs under ``nn.vmap`` with stacked
    params, and two of the three call sites pass an UNBATCHED ``src`` (the
    encoder memory, vmapped over C; each channel's own frames, vmapped over
    the C-1 pair axis). Folding keeps the normalized src unbatched, so
    vmap's dot_general batching rule merges the stacked kernels into the
    RHS free dims: ONE (B*S, E) x (E, pairs*F) MXU matmul instead of
    ``pairs`` separate half-lane dots, and no (B, C, C-1, L, E) broadcast
    of the per-pair LN affine — at B=64 that broadcast alone was ~1.8GB of
    HBM traffic per decoder layer per direction.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src, tgt, mask=None, deterministic: bool = True):
        """
        Args:
            src: (..., S, E) keys/values source.
            tgt: (..., L, E) queries source.
            mask: broadcastable to (..., num_heads, L, S) boolean, True=keep.
        """
        e = src.shape[-1]
        ln_scale, ln_bias = _LayerNormParams(e, name="LayerNorm_0")()
        q_k, q_b = _DenseParams(e, self.embed_dim, name="Dense_0")()
        k_k, k_b = _DenseParams(e, self.embed_dim, name="Dense_1")()
        v_k, v_b = _DenseParams(e, self.embed_dim, name="Dense_2")()
        dt = self.dtype or jnp.promote_types(src.dtype, jnp.float32)

        def folded_mlp(x_n, kernel, bias):
            k = (ln_scale[:, None] * kernel).astype(dt)
            b = (ln_bias @ kernel + bias).astype(dt)
            return nn.relu(jnp.matmul(x_n.astype(dt), k) + b)

        src_n = _norm_f32(src)
        tgt_n = src_n if tgt is src else _norm_f32(tgt)
        query = folded_mlp(tgt_n, q_k, q_b)
        key = folded_mlp(src_n, k_k, k_b)
        value = folded_mlp(src_n, v_k, v_b)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            attention_fn=lean_attention,
        )(query, key, value, mask=mask)
        return query + out


class ChannelInteractionsLayer(nn.Module):
    """Each channel cross-attends every OTHER channel, concat + linear
    (reference models.py:103-162), with the per-target-channel layers
    vmapped over a stacked (Nother,) parameter axis."""

    embed_dim: int
    num_heads: int
    num_tgt_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src_channel, tgt_channels, mask=None, deterministic=True):
        """
        Args:
            src_channel: (B, L, E); tgt_channels: (B, Nother, L, E).

        Dropout on the inputs runs at the COMPOSED rate 1-(1-p)^2: the
        reference drops these tensors twice back to back — once in the
        decoder layer (models.py:253-254) and again here (models.py:147-148).
        Two independent Dropout(p) passes are distribution-identical to one
        Dropout(1-(1-p)^2) (per element: keep ~ Bern((1-p)^2), survivor
        scale 1/(1-p)^2 either way), so the composition is folded into this
        layer and ``MultiChannelDecoderLayer`` no longer pre-drops — saving
        one full mask generation + apply over the (B, C, C-1, L, E) pair
        tensor per decoder layer (benchmarks/NOTES.md "Lean attention").
        """
        composed = 1.0 - (1.0 - self.dropout) ** 2
        drop = nn.Dropout(composed)
        src = drop(src_channel, deterministic=deterministic)
        tgts = drop(tgt_channels, deterministic=deterministic)

        # deterministic passed POSITIONALLY: nn.vmap drops kwargs silently.
        vmapped = nn.vmap(
            ChannelProcessingLayer,
            in_axes=(None, 1, None, None),
            out_axes=1,
            axis_size=self.num_tgt_channels,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout, self.dtype)
        outs = vmapped(src, tgts, mask, deterministic)
        # (B, Nother, L, E) -> concat channels (B, L, Nother * E)
        b, n, l, e = outs.shape
        concat = jnp.swapaxes(outs, 1, 2).reshape(b, l, n * e)
        # single reference dropout (models.py:159) — plain rate, not composed
        concat = nn.Dropout(self.dropout)(concat, deterministic=deterministic)
        # LN affine folded into the projection (same trick as
        # ChannelProcessingLayer: tree/numerics preserved, one fewer
        # elementwise pass over the (B, L, (C-1)*E) concat per channel).
        ln_scale, ln_bias = _LayerNormParams(n * e, name="LayerNorm_0")()
        kernel, bias = _DenseParams(n * e, self.embed_dim, name="Dense_0")()
        dt = self.dtype or jnp.promote_types(concat.dtype, jnp.float32)
        k = (ln_scale[:, None] * kernel).astype(dt)
        bb = (ln_bias @ kernel + bias).astype(dt)
        return nn.relu(jnp.matmul(_norm_f32(concat).astype(dt), k) + bb)


# Shared initializer instances: jax caches the traced sampler per closure
# identity, so a fresh variance_scaling(...) per parameter would recompile
# its ~3s truncated-normal program for every draw (measured: 20 params x
# 3.4s at init). One instance per axis config keeps init at 3 compiles.
_STACKED_LECUN = {
    axes: nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal",
        in_axis=axes[0], out_axis=axes[1], batch_axis=(0, 1),
    )
    for axes in (((-2,), (-1,)), ((-3,), (-2, -1)), ((-3, -2), (-1,)))
}


class _StackedParamPair(nn.Module):
    """Parameter bag: {kernel, bias} with explicit stacked shapes/inits —
    reproduces the tree one ``nn.Dense``/``DenseGeneral`` leaves under a
    double ``nn.vmap`` lift (leading (C, C-1) axes)."""

    kshape: tuple
    bshape: tuple
    kin_axis: tuple = (-2,)
    kout_axis: tuple = (-1,)

    @nn.compact
    def __call__(self):
        init = _STACKED_LECUN[(self.kin_axis, self.kout_axis)]
        return (
            self.param("kernel", init, self.kshape),
            self.param("bias", nn.initializers.zeros, self.bshape),
        )


class _StackedLayerNormParams(nn.Module):
    """{scale, bias} with an explicit stacked shape."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, self.shape),
            self.param("bias", nn.initializers.zeros, self.shape),
        )


class FusedChannelInteractions(nn.Module):
    """The cross-channel interactions stack (reference models.py:103-162) as
    EXPLICIT stacked-parameter einsums instead of a double ``nn.vmap`` lift,
    with the attention dispatchable to the fused Pallas training kernel
    (ops/pallas_train_attention.py) so the (B, C, C-1, H, L, L) score
    tensor — the decoder's HBM bottleneck at serving batch — never
    materializes.

    STATUS: measured reference, NOT the production path. On v5e at the
    serving accum optimum this formulation LOSES to the nn.vmap lift —
    bf16 B=64 accum16: 59.6ms (vmap) vs 65.4ms (explicit einsums, XLA
    attend) vs 225ms (Pallas attend: hd=16 dots cost ~5.5us per 8-group
    grid step against XLA's fully pipelined batched dots, plus 61.5ms of
    layout copies feeding the merged-G operands). Full table + roofline in
    benchmarks/NOTES.md "Fused training attention". Kept because the tree-
    identical param bags and the golden tests
    (tests/test_pallas_train_attention.py) document exactly what was
    measured, and because the folded-projection variant remains the
    starting point if a future Mosaic release changes the small-dot
    economics.

    Parameter tree, shapes and math are IDENTICAL to the previous
    ``nn.vmap(ChannelInteractionsLayer)`` path (instantiated under the same
    ``VmapChannelInteractionsLayer_0`` name; golden-tested against the
    module formulation in tests/test_transformer.py) — the same folded-
    LayerNorm trick keeps the per-pair K/V MLP contraction reading the
    UNBATCHED normalized source. Dropout semantics match flax exactly:
    composed-rate input dropout (see ChannelInteractionsLayer docstring),
    per-(c, j)-pair attention-probability keep masks broadcast over batch
    and heads (flax ``broadcast_dropout`` under split rngs), and the plain
    concat dropout.

    The Pallas attend applies the causal mask only: under a causal mask
    every key <= a valid query is itself valid, and invalid queries get
    zero cotangent from the mask-aware loss, so key-padding masking is
    unobservable in any loss-visible output or gradient. The einsum
    fallback (off-TPU-unsupported shapes) applies the full ``tgt_mask``.
    """

    embed_dim: int
    num_heads: int
    num_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, proc, tgt_mask=None, deterministic: bool = True):
        """proc: (B, C, L, E) post-self-attention channels -> (B, C, L, E)."""
        b, c, l, e = proc.shape
        h = self.num_heads
        hd = e // h
        n_pairs = c * (c - 1)
        dt = self.dtype or jnp.promote_types(proc.dtype, jnp.float32)

        p = _InterCPLParams(
            c=c, e=e, heads=h, name="VmapChannelProcessingLayer_0"
        )()

        composed = 1.0 - (1.0 - self.dropout) ** 2
        drop_in = nn.Dropout(composed)
        src = drop_in(proc, deterministic=deterministic)
        others = _expand_others(proc, c)  # (B, C, C-1, L, E)
        others = drop_in(others, deterministic=deterministic)

        src_n = _norm_f32(src)  # (B, C, L, E)
        others_n = _norm_f32(others)  # (B, C, C-1, L, E)

        def fold(kernel, bias):
            k = (p["ln_scale"][..., None] * kernel).astype(dt)
            bb = (
                jnp.einsum("cje,cjef->cjf", p["ln_bias"], kernel) + bias
            ).astype(dt)
            return k, bb

        qk, qb = fold(p["q_kernel"], p["q_bias"])
        kk, kb = fold(p["k_kernel"], p["k_bias"])
        vk, vb = fold(p["v_kernel"], p["v_bias"])

        # Queries from the OTHER channels, keys/values from the channel's
        # own frames (reference models.py:147-158) — pair-major outputs so
        # the merged-group kernel layout needs no extra transpose.
        q_mlp = nn.relu(
            jnp.einsum("bcjle,cjef->cjblf", others_n.astype(dt), qk)
            + qb[:, :, None, None]
        )
        k_mlp = nn.relu(
            jnp.einsum("bcle,cjef->cjblf", src_n.astype(dt), kk)
            + kb[:, :, None, None]
        )
        v_mlp = nn.relu(
            jnp.einsum("bcle,cjef->cjblf", src_n.astype(dt), vk)
            + vb[:, :, None, None]
        )

        scale = 1.0 / math.sqrt(hd)
        q = (
            jnp.einsum("cjblf,cjfhd->cjbhld", q_mlp, p["mha_q_kernel"].astype(dt))
            + p["mha_q_bias"][:, :, None, :, None].astype(dt)
        ) * scale
        k = (
            jnp.einsum("cjblf,cjfhd->cjbhld", k_mlp, p["mha_k_kernel"].astype(dt))
            + p["mha_k_bias"][:, :, None, :, None].astype(dt)
        )
        v = (
            jnp.einsum("cjblf,cjfhd->cjbhld", v_mlp, p["mha_v_kernel"].astype(dt))
            + p["mha_v_bias"][:, :, None, :, None].astype(dt)
        )

        use_dropout = (not deterministic) and self.dropout > 0.0
        if use_dropout:
            keep_prob = 1.0 - self.dropout
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), keep_prob, (n_pairs, l, l)
            ).astype(jnp.float32) / keep_prob
            keep_pairs = n_pairs
        else:
            keep = jnp.ones((1, l, l), jnp.float32)
            keep_pairs = 1

        g = n_pairs * b * h
        if pallas_train_attention.supported(g, l, hd, g // keep_pairs):
            av = pallas_train_attention.fused_causal_attend(
                q.reshape(g, l, hd).astype(jnp.float32),
                k.reshape(g, l, hd).astype(jnp.float32),
                v.reshape(g, l, hd).astype(jnp.float32),
                keep,
                keep_pairs,
            ).reshape(c, c - 1, b, h, l, hd).astype(dt)
        else:
            # XLA fallback: materialized scores, full tgt_mask semantics.
            s = jnp.einsum("cjbhld,cjbhmd->cjbhlm", q.astype(dt), k.astype(dt))
            causal = jnp.tril(jnp.ones((l, l), bool))
            mask = causal[None, None, None, None]
            if tgt_mask is not None:
                # tgt_mask: (B, 1, L, L) bool -> (1, 1, B, 1, L, L)
                mask = mask & tgt_mask[None, None]
            s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
            m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
            ex = jnp.exp(s - m)
            z = jnp.sum(ex, axis=-1, keepdims=True)
            probs = ex / z
            probs = probs * keep.reshape(c, c - 1, 1, 1, l, l) if use_dropout \
                else probs
            av = jnp.einsum("cjbhlm,cjbhmd->cjbhld", probs, v.astype(probs.dtype))

        out_i = (
            jnp.einsum("cjbhld,cjhde->cjble", av, p["mha_out_kernel"].astype(dt))
            + p["mha_out_bias"][:, :, None, None].astype(dt)
        )
        outs = q_mlp + out_i  # (C, C-1, B, L, E) query residual

        # concat channels -> (B, C, L, (C-1)*E)
        concat = jnp.transpose(outs, (2, 0, 3, 1, 4)).reshape(
            b, c, l, (c - 1) * e
        )
        concat = nn.Dropout(self.dropout)(concat, deterministic=deterministic)

        ln2_s, ln2_b = _StackedLayerNormParams(
            (c, (c - 1) * e), name="LayerNorm_0"
        )()
        proj_k, proj_b = _StackedParamPair(
            (c, (c - 1) * e, e), (c, e), kin_axis=(-2,), kout_axis=(-1,),
            name="Dense_0",
        )()
        kf = (ln2_s[:, :, None] * proj_k).astype(dt)
        bf = (jnp.einsum("cx,cxe->ce", ln2_b, proj_k) + proj_b).astype(dt)
        return nn.relu(
            jnp.einsum("bclx,cxe->bcle", _norm_f32(concat).astype(dt), kf)
            + bf[:, None]
        )


class _InterCPLParams(nn.Module):
    """Parameter bag reproducing the double-vmapped ChannelProcessingLayer
    subtree (LayerNorm_0, Dense_0/1/2 Q/K/V MLPs,
    MultiHeadDotProductAttention_0 q/k/v/out projections) with stacked
    (C, C-1) leading axes — tree-identical to the nn.vmap formulation."""

    c: int
    e: int
    heads: int

    @nn.compact
    def __call__(self):
        c, e, h = self.c, self.e, self.heads
        ln_s, ln_b = _StackedLayerNormParams((c, c - 1, e), name="LayerNorm_0")()
        q_k, q_b = _StackedParamPair(
            (c, c - 1, e, e), (c, c - 1, e), name="Dense_0"
        )()
        k_k, k_b = _StackedParamPair(
            (c, c - 1, e, e), (c, c - 1, e), name="Dense_1"
        )()
        v_k, v_b = _StackedParamPair(
            (c, c - 1, e, e), (c, c - 1, e), name="Dense_2"
        )()
        mha = _InterMHAParams(c=c, e=e, heads=h,
                              name="MultiHeadDotProductAttention_0")()
        return {
            "ln_scale": ln_s, "ln_bias": ln_b,
            "q_kernel": q_k, "q_bias": q_b,
            "k_kernel": k_k, "k_bias": k_b,
            "v_kernel": v_k, "v_bias": v_b,
            **mha,
        }


class _InterMHAParams(nn.Module):
    """{query, key, value, out} DenseGeneral param pairs, stacked (C, C-1)."""

    c: int
    e: int
    heads: int

    @nn.compact
    def __call__(self):
        c, e, h = self.c, self.e, self.heads
        hd = e // h
        q_k, q_b = _StackedParamPair(
            (c, c - 1, e, h, hd), (c, c - 1, h, hd),
            kin_axis=(-3,), kout_axis=(-2, -1), name="query",
        )()
        k_k, k_b = _StackedParamPair(
            (c, c - 1, e, h, hd), (c, c - 1, h, hd),
            kin_axis=(-3,), kout_axis=(-2, -1), name="key",
        )()
        v_k, v_b = _StackedParamPair(
            (c, c - 1, e, h, hd), (c, c - 1, h, hd),
            kin_axis=(-3,), kout_axis=(-2, -1), name="value",
        )()
        o_k, o_b = _StackedParamPair(
            (c, c - 1, h, hd, e), (c, c - 1, e),
            kin_axis=(-3, -2), kout_axis=(-1,), name="out",
        )()
        return {
            "mha_q_kernel": q_k, "mha_q_bias": q_b,
            "mha_k_kernel": k_k, "mha_k_bias": k_b,
            "mha_v_kernel": v_k, "mha_v_bias": v_b,
            "mha_out_kernel": o_k, "mha_out_bias": o_b,
        }


class MultiChannelDecoderLayer(nn.Module):
    """Self per channel -> cross-channel -> cross-memory -> FF
    (reference models.py:165-277). All per-channel layers are vmapped."""

    embed_dim: int
    num_heads: int
    num_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

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
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout, self.dtype)
        tgt_d = drop(tgt, deterministic=deterministic)
        proc = self_vmapped(tgt_d, tgt_d, tgt_mask, deterministic)

        # 2. cross-channel interactions, vmapped over the source channel.
        # For channel i the "others" are proc without row i — expanded by
        # _expand_others, which dispatches between the fancy-index gather
        # (wins at the thesis batch) and an exact one-hot contraction (wins
        # at serving batch, where the gather's while-loop lowering costs
        # ~1ms/layer) by the measured B>=64 crossover.
        #
        # MEASURED NEGATIVE RESULT (round 5, benchmarks/NOTES.md "Fused
        # training attention"): dispatching this stack to the explicit
        # einsum formulation with the Pallas fused-attention kernel
        # (FusedChannelInteractions + ops/pallas_train_attention.py) LOSES
        # at the serving accum optimum — bf16 B=64 accum16: 59.6 -> 225ms
        # (kernel per-grid-step cost ~5.5us on tiny hd=16 dots + 61.5ms of
        # layout copies feeding the merged-G operands), and even the
        # kernel-less explicit einsums regress to 65.4ms. The nn.vmap lift
        # stays the production path; the explicit layer is kept as the
        # measured reference, golden-tested against this one
        # (tests/test_pallas_train_attention.py).
        others = _expand_others(proc, c)  # (B, C, C-1, L, E)
        inter_vmapped = nn.vmap(
            ChannelInteractionsLayer,
            in_axes=(1, 1, None, None),
            out_axes=1,
            axis_size=c,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, c - 1, self.dropout, self.dtype)
        # The reference's decoder-level drop of proc/others (models.py:253-254)
        # is folded into ChannelInteractionsLayer's composed-rate input drop
        # (distribution-identical; see its docstring).
        inter = inter_vmapped(proc, others, tgt_mask, deterministic)

        # 3. cross attention to encoder memory, per channel
        mem_vmapped = nn.vmap(
            ChannelProcessingLayer,
            in_axes=(None, 1, None, None),
            out_axes=1,
            axis_size=c,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.embed_dim, self.num_heads, self.dropout, self.dtype)
        mem_d = drop(memory, deterministic=deterministic)
        inter_d = drop(inter, deterministic=deterministic)
        attended = mem_vmapped(mem_d, inter_d, memory_mask, deterministic)

        attended = nn.LayerNorm(dtype=self.dtype)(attended)
        # pre-FF LN affine folded into the FF projection (tree preserved)
        e = self.embed_dim
        ln_scale, ln_bias = _LayerNormParams(e, name="LayerNorm_1")()
        kernel, bias = _DenseParams(e, e, name="Dense_0")()
        dt = self.dtype or jnp.promote_types(attended.dtype, jnp.float32)
        k = (ln_scale[:, None] * kernel).astype(dt)
        bb = (ln_bias @ kernel + bias).astype(dt)
        h = _norm_f32(drop(attended, deterministic=deterministic))
        ff = nn.relu(jnp.matmul(h.astype(dt), k) + bb)
        return attended + ff


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch nn.TransformerEncoderLayer defaults:
    ReLU, dim_feedforward configurable)."""

    embed_dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            attention_fn=lean_attention,
        )(x, x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype)(x + nn.Dropout(self.dropout)(attn, deterministic=deterministic))
        ff = nn.Dense(self.ff_dim, dtype=self.dtype)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.embed_dim, dtype=self.dtype)(ff)
        return nn.LayerNorm(dtype=self.dtype)(x + nn.Dropout(self.dropout)(ff, deterministic=deterministic))


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
    #: flax compute dtype (params stay f32); bf16 halves the HBM traffic of
    #: the (B, C, C-1, H, L, L) cross-channel attention scores — the step's
    #: bandwidth bottleneck (benchmarks/BENCH_DETAILS.md roofline notes).
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.src_embedding = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)
        self.pos_encoding = PositionalEncoding(self.dropout)
        self.tgt_pos_encoding = PositionalEncoding(self.dropout)
        self.encoder_layers = [
            TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.encoder_ff_dim, self.dropout,
                dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]
        # NOTE: nn.remat on these layers was measured and LOSES at EVERY
        # batch (benchmarks/NOTES.md "Decoder remat"): B=12 28.5->33.9ms
        # f32 (0.84x; score store is only ~10% of step HBM traffic there),
        # and at serving batch — where the live activation set DOES
        # outgrow HBM and XLA's own spill/remat pass fires — explicit
        # layer remat is still worse (B=64: 183->227ms f32, 101->137ms
        # bf16): it recomputes the whole layer where XLA remats only what
        # spills. The serving-batch fix is microbatched grad accumulation
        # (train/step.py accum_steps), not remat.
        self.decoder_layers = [
            MultiChannelDecoderLayer(
                self.embed_dim,
                self.num_heads,
                self.num_articulators,
                self.dropout,
                dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]
        self.tgt_embed_ln = nn.LayerNorm(dtype=self.dtype)
        self.tgt_embed_dense = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.head_ln = nn.LayerNorm(dtype=self.dtype)
        self.head_dense = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.predictors = nn.vmap(
            ArticulatorPredictor,
            in_axes=None,
            out_axes=2,
            axis_size=self.num_articulators,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(n_samples=self.num_feat // 2, dtype=self.dtype)

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
            h = layer(h, memory, tgt_mask, memory_mask, deterministic)
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

        tgt0 = jnp.zeros((b, buf_len, c, f), self.dtype or jnp.float32)
        tgt_buf, _ = jax.lax.scan(step, tgt0, jnp.arange(s))
        return tgt_buf[:, 1:].reshape(b, s, c, 2, f // 2)


def _ln_norm(x, eps=1e-6):
    """Parameter-free part of flax LayerNorm over the last axis."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def make_fast_generate(model: ArtSpeechTransformer, max_len: int = 0,
                       cache_dtype=None, n_chunks="auto", attend_impl="auto"):
    """KV-cached autoregressive generation as a pure-JAX scan over the
    extracted parameter tree.

    The method-based ``generate`` re-decodes the full buffer every step
    (O(T^2) attention per step, O(T^3) total). The flax decode-cache
    version of this sampler paid two avoidable per-step costs that pushed
    its break-even out to T~128: a full-length ``init`` pass just to size
    the caches, and — dominant — re-projecting the encoder memory through
    every layer's per-channel key/value MLP + attention projections at
    every step (O(S * E^2 * C * L) FLOPs per generated frame). This
    implementation hoists all memory-side projections out of the scan,
    materializes the per-layer self/cross-channel KV caches directly with
    ``jnp.zeros``, and performs each step as a handful of channel-batched
    einsums against ``params``.

    The KV caches are stored (S, hd, G) with every batch/head dim merged
    into the lane axis G, so each step's update is one contiguous span of
    full (8, 128) tiles — the only layout this XLA build updates in place
    inside a scan — and attention reads them with broadcast-multiply +
    axis reductions instead of dots (a dot re-tiles, re-materializing the
    whole cache every step). That layout change took the T=128 decode
    from 244ms to 158ms (chained wall, v5e, B=4, C=10).

    On top of that, the time loop runs as ``n_chunks`` consecutive scans
    ("auto": 1 below T=112, 2 to T<256, 4 above — measured crossovers),
    each step statically slicing only the live cache prefix, which cuts
    the average cache-stream extent to (n+1)/(2n) of full-length reads:
    T=128 158 -> 136ms f32, T=256 636 -> 426ms f32 / 346 -> 277ms bf16
    (chained wall; no effect on numerics — rows past t are softmax zeros
    either way).

    Measured crossover vs the buffer re-decode (v5e, B=4, C=10, chained
    wall — the round-3 table in benchmarks/BENCH_DETAILS.md): the cached
    scan wins at T<=48 (1.6-2.5x) and T>=128 (3.9-6.8x with chunking)
    but LOSES in a T=64..112 band (0.73-0.86x even with the chunked
    prefix), where the buffer path's full-redecode cost is anomalously
    flat (its per-redecode cost stays ~0.7ms until a >6x cliff between
    T=112 and 128, a compiler tiling regime — measured, not modeled).
    Use :func:`make_auto_generate` for the never-slower per-bucket
    dispatch; the CLIs default to it.

    ``cache_dtype="bfloat16"`` halves cache storage and HBM traffic —
    above ~94MB of caches (T>=~120 at these shapes) the f32 caches spill
    out of VMEM and every step streams them from HBM. Measured: T=128
    decode 158 -> 95ms (-> 82ms with the chunked prefix). Score and
    softmax math stays f32 either way, but storing K/V rounded to bf16
    compounds autoregressively: max output delta 4.6e-2 vs the module
    path over a 128-frame sentence, so it is OPT-IN (offline synthesis
    quality work should keep the f32 default).

    Numerics match the module path (same flax Dense/LayerNorm/MHA math,
    reduction order differs): per-step parity ~1e-5, autoregressive
    feedback compounds to ~1e-4 over thesis-length sentences.

    Args:
        model: the teacher-forced model definition (parameters are shared).
        max_len: kept for API compatibility; caches are sized to the
            source length of each call.
        n_chunks: number of consecutive chunked-prefix scans the time
            loop is split into ("auto" = measured per-length policy; an
            int pins it, e.g. for benchmarking the single-scan path).
        attend_impl: "auto" (default) dispatches the cache-streaming
            attends to the Pallas flash kernel (ops/pallas_attention.py)
            on TPU when the live cache prefix is in the HBM-streaming
            regime — in situ XLA runs those score/PV fusions ~7x below
            its own isolated rate (94 vs 689 GB/s measured at B=64,
            op-profiler spans), which the kernel is immune to. "xla" /
            "flash" pin one implementation (numerics agree to ~1e-6).
    Returns:
        fast_generate(params, src, src_lengths) -> (B, S, C, 2, D); jit it.
    """
    del max_len
    cache_dtype = jnp.dtype(cache_dtype if cache_dtype is not None else jnp.float32)
    c = model.num_articulators
    f = model.num_feat
    e = model.embed_dim
    n_heads = model.num_heads
    hd = e // n_heads
    scale = 1.0 / math.sqrt(hd)
    n_layers = model.num_layers

    def ln(x, p):
        return _ln_norm(x) * p["scale"] + p["bias"]

    def fast_generate(params, src, src_lengths=None):
        b, s = src.shape
        memory, memory_mask = model.apply(
            {"params": params}, src, src_lengths, method=ArtSpeechTransformer.encode
        )
        # The scan math below runs on raw f32 params; cast the encoder
        # memory up so a bf16-compute model (dtype="bfloat16") feeds the
        # same f32 decode loop.
        memory = memory.astype(jnp.float32)
        dtype = memory.dtype
        neg = jnp.finfo(dtype).min
        # memory_mask: (B, 1, 1, S) bool -> additive bias (B, 1, 1, S)
        mem_bias = (
            jnp.where(memory_mask, 0.0, neg).astype(dtype)
            if memory_mask is not None
            else jnp.zeros((b, 1, 1, memory.shape[1]), dtype)
        )

        layers = [params[f"decoder_layers_{i}"] for i in range(n_layers)]

        # ---- hoisted: memory K/V through every layer's per-channel
        # cross-attention (LN -> K/V MLP -> MHA K/V projection) ----
        mem_norm = _ln_norm(memory)  # (B, S, E), shared across channels
        mem_kv = []
        for lp in layers:
            cp = lp["VmapChannelProcessingLayer_1"]  # stacked (C, ...)
            ln_p = cp["LayerNorm_0"]
            src_ln = mem_norm[:, None] * ln_p["scale"][None, :, None] + ln_p["bias"][None, :, None]
            # (B, C, S, E) -> K/V MLPs (Dense_1/Dense_2) -> MHA k/v projections
            k_mlp = nn.relu(jnp.einsum("bcse,cef->bcsf", src_ln, cp["Dense_1"]["kernel"]) + cp["Dense_1"]["bias"][None, :, None])
            v_mlp = nn.relu(jnp.einsum("bcse,cef->bcsf", src_ln, cp["Dense_2"]["kernel"]) + cp["Dense_2"]["bias"][None, :, None])
            mha = cp["MultiHeadDotProductAttention_0"]
            k = jnp.einsum("bcsf,cfhd->bcshd", k_mlp, mha["key"]["kernel"]) + mha["key"]["bias"][None, :, None]
            v = jnp.einsum("bcsf,cfhd->bcshd", v_mlp, mha["value"]["kernel"]) + mha["value"]["bias"][None, :, None]
            mem_kv.append((k, v))

        # Sized to the actual decode length: a fixed 5000-row table would
        # silently clamp pos_table[t] for longer sources (advisor r2).
        pos_table = sinusoidal_positions(s, e).astype(dtype)

        def mha_out(attended_heads, mha_p):
            # (B, C, H, hd) x (C, H, hd, E) -> (B, C, E)
            return (
                jnp.einsum("bchd,chde->bce", attended_heads, mha_p["out"]["kernel"])
                + mha_p["out"]["bias"][None]
            )

        # KV caches are stored (S, hd, G) with G = all batch/head dims
        # merged into the lane axis: row t is then a contiguous span of
        # full (8, 128) tiles, which is the ONLY shape this XLA build
        # updates in place inside a scan (any trailing-(H, hd) layout
        # degrades to a full-cache rewrite per step: measured 250-500us
        # vs 3.5us for one 11.8MB cache).  Attention is computed as
        # broadcast-multiply + axis reductions rather than dots: a dot
        # needs its operand re-tiled, which re-materializes the whole
        # cache every step (+73us measured; benchmarks/NOTES.md).
        def to_row(x):
            # (..., H, hd) -> (1, hd, G): one cache row
            return x.reshape(x.size // hd, hd).T[None].astype(cache_dtype)

        def flash_ok(p_end, g):
            # Static dispatch between the XLA broadcast-multiply attend and
            # the Pallas flash kernel. "auto" uses the kernel only where the
            # per-(k,v) cache prefix is big enough to be HBM-streamed (the
            # regime where in-situ XLA collapses to ~94 GB/s); below it the
            # caches stay VMEM-resident and XLA's fused attend wins
            # (isolated flash measured 0.54x at the 21MB self cache).
            if attend_impl == "xla" or not pallas_attention.supported(p_end, hd, g):
                return False
            if attend_impl == "flash":
                return True
            bytes_k = p_end * hd * g * cache_dtype.itemsize
            return (jax.default_backend() == "tpu"
                    and bytes_k >= pallas_attention.HBM_STREAM_BYTES)

        def attend(cache_k, cache_v, qg, t, t_bias, p_end):
            # cache (S, hd, G), qg (hd, G), t_bias (p_end,) -> (G, hd)
            # Only the first p_end rows are read (rows > t are softmax
            # zeros anyway): inside chunk ci of the chunked-prefix scans
            # below, this statically bounds the HBM traffic of the
            # dominant cache-streaming reductions to the live prefix.
            # score/softmax math stays f32; bf16 caches only shrink storage
            if flash_ok(p_end, cache_k.shape[2]):
                return pallas_attention.flash_decode_attend(
                    cache_k, cache_v, qg, t, p_end
                ).T
            k_p = jax.lax.slice_in_dim(cache_k, 0, p_end, axis=0)
            v_p = jax.lax.slice_in_dim(cache_v, 0, p_end, axis=0)
            logits = jnp.sum(k_p.astype(dtype) * qg[None], axis=1) + t_bias[:, None]
            attn = jax.nn.softmax(logits, axis=0)  # over time
            return jnp.sum(v_p.astype(dtype) * attn[:, None, :], axis=0).T

        def step_of(p_end):
          def step(carry, t):
            caches, prev = carry  # prev: (B, C, F)
            h = ln(prev, {"scale": params["tgt_embed_ln"]["scale"], "bias": params["tgt_embed_ln"]["bias"]})
            h = nn.relu(jnp.einsum("bcf,fe->bce", h, params["tgt_embed_dense"]["kernel"]) + params["tgt_embed_dense"]["bias"])
            h = h + pos_table[t]

            # causal additive bias over the live cache prefix
            t_bias = jnp.where(jnp.arange(p_end) <= t, 0.0, neg).astype(dtype)

            new_caches = []
            for i, lp in enumerate(layers):
                cache = caches[i]
                # ---- 1. per-channel causal self attention ----
                cp = lp["VmapChannelProcessingLayer_0"]
                h_ln = _ln_norm(h) * cp["LayerNorm_0"]["scale"][None] + cp["LayerNorm_0"]["bias"][None]
                q_mlp = nn.relu(jnp.einsum("bce,cef->bcf", h_ln, cp["Dense_0"]["kernel"]) + cp["Dense_0"]["bias"][None])
                k_mlp = nn.relu(jnp.einsum("bce,cef->bcf", h_ln, cp["Dense_1"]["kernel"]) + cp["Dense_1"]["bias"][None])
                v_mlp = nn.relu(jnp.einsum("bce,cef->bcf", h_ln, cp["Dense_2"]["kernel"]) + cp["Dense_2"]["bias"][None])
                mha = cp["MultiHeadDotProductAttention_0"]
                q = jnp.einsum("bcf,cfhd->bchd", q_mlp, mha["query"]["kernel"]) + mha["query"]["bias"][None]
                k_new = jnp.einsum("bcf,cfhd->bchd", k_mlp, mha["key"]["kernel"]) + mha["key"]["bias"][None]
                v_new = jnp.einsum("bcf,cfhd->bchd", v_mlp, mha["value"]["kernel"]) + mha["value"]["bias"][None]
                k_self = jax.lax.dynamic_update_slice_in_dim(cache["k_self"], to_row(k_new), t, axis=0)
                v_self = jax.lax.dynamic_update_slice_in_dim(cache["v_self"], to_row(v_new), t, axis=0)
                qg = (q * scale).reshape(b * c * n_heads, hd).T
                av = attend(k_self, v_self, qg, t, t_bias, p_end).reshape(b, c, n_heads, hd)
                proc = q_mlp + mha_out(av, mha)  # (B, C, E)

                # ---- 2. cross-channel interactions ----
                il = lp["VmapChannelInteractionsLayer_0"]
                icp = il["VmapChannelProcessingLayer_0"]  # stacked (C, C-1, ...)
                proc_norm = _ln_norm(proc)  # (B, C, E)
                iln = icp["LayerNorm_0"]
                # keys/values from channel c's own frame; queries from others
                src_ln = proc_norm[:, :, None] * iln["scale"][None] + iln["bias"][None]  # (B,C,C-1,E)
                tgt_ln = _expand_others(proc_norm, c) * iln["scale"][None] + iln["bias"][None]
                q_mlp_i = nn.relu(jnp.einsum("bcje,cjef->bcjf", tgt_ln, icp["Dense_0"]["kernel"]) + icp["Dense_0"]["bias"][None])
                k_mlp_i = nn.relu(jnp.einsum("bcje,cjef->bcjf", src_ln, icp["Dense_1"]["kernel"]) + icp["Dense_1"]["bias"][None])
                v_mlp_i = nn.relu(jnp.einsum("bcje,cjef->bcjf", src_ln, icp["Dense_2"]["kernel"]) + icp["Dense_2"]["bias"][None])
                imha = icp["MultiHeadDotProductAttention_0"]
                q_i = jnp.einsum("bcjf,cjfhd->bcjhd", q_mlp_i, imha["query"]["kernel"]) + imha["query"]["bias"][None]
                k_i = jnp.einsum("bcjf,cjfhd->bcjhd", k_mlp_i, imha["key"]["kernel"]) + imha["key"]["bias"][None]
                v_i = jnp.einsum("bcjf,cjfhd->bcjhd", v_mlp_i, imha["value"]["kernel"]) + imha["value"]["bias"][None]
                k_inter = jax.lax.dynamic_update_slice_in_dim(cache["k_inter"], to_row(k_i), t, axis=0)
                v_inter = jax.lax.dynamic_update_slice_in_dim(cache["v_inter"], to_row(v_i), t, axis=0)
                qg_i = (q_i * scale).reshape(b * c * (c - 1) * n_heads, hd).T
                av_i = attend(k_inter, v_inter, qg_i, t, t_bias, p_end).reshape(b, c, c - 1, n_heads, hd)
                out_i = jnp.einsum("bcjhd,cjhde->bcje", av_i, imha["out"]["kernel"]) + imha["out"]["bias"][None]
                outs = q_mlp_i + out_i  # (B, C, C-1, E)
                concat = outs.reshape(b, c, (c - 1) * e)
                concat = _ln_norm(concat) * il["LayerNorm_0"]["scale"][None] + il["LayerNorm_0"]["bias"][None]
                inter = nn.relu(jnp.einsum("bcx,cxe->bce", concat, il["Dense_0"]["kernel"]) + il["Dense_0"]["bias"][None])

                # ---- 3. cross attention to encoder memory (hoisted K/V) ----
                cpm = lp["VmapChannelProcessingLayer_1"]
                inter_ln = _ln_norm(inter) * cpm["LayerNorm_0"]["scale"][None] + cpm["LayerNorm_0"]["bias"][None]
                q_mlp_m = nn.relu(jnp.einsum("bce,cef->bcf", inter_ln, cpm["Dense_0"]["kernel"]) + cpm["Dense_0"]["bias"][None])
                mmha = cpm["MultiHeadDotProductAttention_0"]
                q_m = jnp.einsum("bcf,cfhd->bchd", q_mlp_m, mmha["query"]["kernel"]) + mmha["query"]["bias"][None]
                mem_k, mem_v = mem_kv[i]
                logits_m = jnp.einsum("bchd,bcshd->bchs", q_m * scale, mem_k) + mem_bias
                attn_m = jax.nn.softmax(logits_m, axis=-1)
                av_m = jnp.einsum("bchs,bcshd->bchd", attn_m, mem_v)
                attended = q_mlp_m + mha_out(av_m, mmha)

                # ---- 4. FF with pre-LN (shared across channels) ----
                attended = ln(attended, lp["LayerNorm_0"])
                h_ff = ln(attended, lp["LayerNorm_1"])
                ff = nn.relu(jnp.einsum("bce,ef->bcf", h_ff, lp["Dense_0"]["kernel"]) + lp["Dense_0"]["bias"])
                h = attended + ff
                new_caches.append({"k_self": k_self, "v_self": v_self, "k_inter": k_inter, "v_inter": v_inter})

            # ---- head ----
            flat = h.reshape(b, c * e)
            flat = ln(flat, params["head_ln"])
            hh = nn.relu(flat @ params["head_dense"]["kernel"] + params["head_dense"]["bias"])
            pp = params["predictors"]  # stacked (C, ...)
            h0 = _ln_norm(hh)[:, None] * pp["LayerNorm_0"]["scale"][None] + pp["LayerNorm_0"]["bias"][None]
            h1 = nn.relu(jnp.einsum("bce,ceg->bcg", h0, pp["Dense_0"]["kernel"]) + pp["Dense_0"]["bias"][None])
            h1 = _ln_norm(h1) * pp["LayerNorm_1"]["scale"][None] + pp["LayerNorm_1"]["bias"][None]
            h2 = nn.relu(jnp.einsum("bcg,cgk->bck", h1, pp["Dense_1"]["kernel"]) + pp["Dense_1"]["bias"][None])
            h2 = _ln_norm(h2) * pp["LayerNorm_2"]["scale"][None] + pp["LayerNorm_2"]["bias"][None]
            x_pos = jnp.einsum("bck,ckd->bcd", h2, pp["Dense_2"]["kernel"]) + pp["Dense_2"]["bias"][None]
            y_pos = jnp.einsum("bck,ckd->bcd", h2, pp["Dense_3"]["kernel"]) + pp["Dense_3"]["bias"][None]
            frame = nn.sigmoid(jnp.stack([x_pos, y_pos], axis=-2)).reshape(b, c, f)
            return (new_caches, frame), frame

          return step

        caches0 = [
            {
                "k_self": jnp.zeros((s, hd, b * c * n_heads), cache_dtype),
                "v_self": jnp.zeros((s, hd, b * c * n_heads), cache_dtype),
                "k_inter": jnp.zeros((s, hd, b * c * (c - 1) * n_heads), cache_dtype),
                "v_inter": jnp.zeros((s, hd, b * c * (c - 1) * n_heads), cache_dtype),
            }
            for _ in range(n_layers)
        ]
        prev0 = jnp.zeros((b, c, f), dtype)
        # Chunked-prefix scans: the time loop is split into n_chunks
        # consecutive scans; chunk ci's step statically reads only the
        # first ceil(s*(ci+1)/n_chunks) cache rows in attend(). Average
        # cache traffic drops to (n+1)/(2n) of full-length reads — the
        # decode's dominant cost once the caches spill VMEM (f32 caches
        # ~105MB at T=128, 2x at 256; bf16 halves both). Measured (v5e,
        # B=4, C=10, device profiler span): T<=64 chunking LOSES
        # slightly (0.93-0.95x — caches still resident, extra scan
        # bodies only add fixed cost); T=112 f32 1.10x (nc=2);
        # T=128 f32 1.17x (nc=2, nc=4 ties), bf16 1.10x (nc=2, nc=4
        # REGRESSES to 0.98x); T=256 f32 1.55x (nc=4, nc=8 ties),
        # bf16 1.22-1.28x. Auto policy below follows those crossovers
        # for both cache dtypes; each chunk compiles its own step body.
        if n_chunks == "auto":
            nc = 1 if s < 112 else (2 if s < 256 else 4)
        else:
            nc = int(n_chunks)
        carry = (caches0, prev0)
        parts = []
        start = 0
        for ci in range(nc):
            p_end = -(-s * (ci + 1) // nc)  # ceil
            carry, fr = jax.lax.scan(step_of(p_end), carry,
                                     jnp.arange(start, p_end))
            parts.append(fr)
            start = p_end
        frames = parts[0] if nc == 1 else jnp.concatenate(parts, axis=0)
        # frames: (S, B, C, F) -> (B, S, C, 2, D)
        frames = jnp.transpose(frames, (1, 0, 2, 3))
        return frames.reshape(b, s, c, 2, f // 2)

    return fast_generate


# Measured win/loss band of the cached scan vs the buffer re-decode (v5e,
# round-3 crossover table in benchmarks/BENCH_DETAILS.md): the buffer path
# is faster only for source lengths in [64, 112] (its per-redecode cost is
# flat until a compiler tiling cliff between T=112 and T=128). The band
# survived the (S, hd, G) cache-layout rework and the chunked-prefix
# scans unchanged — re-measured 2026-08 at T in {16..256}: cached
# 1.6-2.5x below it, 3.9-6.8x above it (with chunking), 0.73-0.86x
# inside it.
BUFFER_WINS_LO = 64
BUFFER_WINS_HI = 112


def make_auto_generate(model: ArtSpeechTransformer, cache_dtype=None):
    """Never-slower generation: per-bucket dispatch between the KV-cached
    scan and the buffer re-decode by the measured crossover band.

    The source length is static at trace time (loaders pad to buckets), so
    under ``jax.jit`` each bucket compiles exactly one of the two
    implementations — there is no runtime branch. Regression-guarded by the
    transformer_generate_* rows of benchmarks/run_all.py.

    ``cache_dtype="bfloat16"`` is the opt-in fast-decode profile (see
    :func:`make_fast_generate`): it disables the buffer band because the
    bf16-cache scan beats the buffer there too — measured 1.15-1.41x at
    T in [64, 112] and 5.5x at T=128 (v5e, B=4, C=10, chained wall), so
    with cache rounding accepted the cached path is fastest everywhere.
    """
    fast = make_fast_generate(model, cache_dtype=cache_dtype)

    def auto_generate(params, src, src_lengths=None):
        s = src.shape[1]
        if cache_dtype is None and BUFFER_WINS_LO <= s <= BUFFER_WINS_HI:
            return model.apply(
                {"params": params}, src, src_lengths,
                method=ArtSpeechTransformer.generate,
            )
        return fast(params, src, src_lengths)

    return auto_generate
