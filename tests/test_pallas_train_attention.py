"""Golden tests for the fused training attention path.

Covers the three claims FusedChannelInteractions makes
(models/transformer.py):

1. The explicit stacked-einsum formulation is numerically identical to the
   former ``nn.vmap(ChannelInteractionsLayer)`` lift given the SAME params
   (the bags reproduce that tree exactly).
2. The Pallas kernel path (ops/pallas_train_attention.py, interpret mode on
   CPU) matches the XLA fallback attend — forward and gradients.
3. Causal-only masking in the kernel is EXACT for everything the loss can
   see: on a padded batch, valid positions agree with the full
   ``tgt_mask`` fallback even though the kernel never masks padded keys.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.models.transformer import (
    ChannelInteractionsLayer,
    FusedChannelInteractions,
    _expand_others,
)
from artspeech_tpu.ops import pallas_train_attention
from artspeech_tpu.utils.masks import make_padding_mask


def _causal_mask(b, l, lengths=None):
    causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
    if lengths is None:
        return jnp.broadcast_to(causal, (b, 1, l, l))
    pad = make_padding_mask(lengths, l)
    return causal & pad[:, None, None, :]


def test_fused_inter_matches_vmapped_module():
    """Same params -> same outputs as the nn.vmap module formulation."""
    B, C, L, E, H = 2, 4, 8, 16, 2
    rng = np.random.default_rng(0)
    proc = jnp.asarray(rng.normal(size=(B, C, L, E)), jnp.float32)
    mask = _causal_mask(B, L, jnp.asarray([L, 5], jnp.int32))

    fused = FusedChannelInteractions(embed_dim=E, num_heads=H, num_channels=C)
    params = fused.init(jax.random.PRNGKey(0), proc, mask)["params"]
    out_fused = fused.apply({"params": params}, proc, mask, deterministic=True)

    vm = nn.vmap(
        ChannelInteractionsLayer,
        in_axes=(1, 1, None, None),
        out_axes=1,
        axis_size=C,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
    )(E, H, C - 1, 0.0, None)
    others = _expand_others(proc, C)
    # Standalone init puts the bags at top level (inside the decoder they
    # nest under the "VmapChannelInteractionsLayer_0" instance name).
    out_old = vm.apply({"params": params}, proc, others, mask, True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_old), atol=2e-5
    )


def test_kernel_attend_matches_fallback_forward_and_grad():
    """At a kernel-eligible shape (L=128), the interpret-mode Pallas attend
    must match the XLA fallback einsum attend through the full layer,
    including gradients."""
    B, C, L, E, H = 4, 3, 128, 16, 2
    hd = E // H
    g = C * (C - 1) * B * H
    assert pallas_train_attention.supported(g, L, hd, g)

    rng = np.random.default_rng(1)
    proc = jnp.asarray(rng.normal(size=(B, C, L, E)) * 0.5, jnp.float32)
    layer = FusedChannelInteractions(embed_dim=E, num_heads=H, num_channels=C)
    params = layer.init(jax.random.PRNGKey(0), proc)["params"]

    out_kernel = layer.apply({"params": params}, proc, deterministic=True)

    # Force the fallback by monkeypatching supported() off.
    orig = pallas_train_attention.supported
    try:
        pallas_train_attention.supported = lambda *a, **k: False
        out_fb = layer.apply({"params": params}, proc, deterministic=True)

        def loss_fb(p, x):
            return jnp.sum(jnp.sin(layer.apply({"params": p}, x)))

        g_fb = jax.grad(loss_fb, argnums=(0, 1))(params, proc)
    finally:
        pallas_train_attention.supported = orig

    def loss_k(p, x):
        return jnp.sum(jnp.sin(layer.apply({"params": p}, x)))

    g_k = jax.grad(loss_k, argnums=(0, 1))(params, proc)

    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_fb), atol=2e-5
    )
    flat_k = jax.tree_util.tree_leaves(g_k)
    flat_fb = jax.tree_util.tree_leaves(g_fb)
    for a, b in zip(flat_k, flat_fb):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d < 1e-4 + 1e-3 * float(jnp.max(jnp.abs(b)))


def test_kernel_causal_only_masking_exact_on_valid_positions():
    """Padded batch: the kernel ignores key padding (causal-only), the
    fallback applies the full tgt_mask — valid positions must still agree
    exactly (the docstring's exactness argument, empirically)."""
    B, C, L, E, H = 4, 3, 128, 16, 2
    rng = np.random.default_rng(2)
    proc = jnp.asarray(rng.normal(size=(B, C, L, E)) * 0.5, jnp.float32)
    lengths = jnp.asarray([L, 90, 40, 7], jnp.int32)
    mask = _causal_mask(B, L, lengths)

    layer = FusedChannelInteractions(embed_dim=E, num_heads=H, num_channels=C)
    params = layer.init(jax.random.PRNGKey(0), proc)["params"]
    out_kernel = layer.apply({"params": params}, proc, mask, deterministic=True)

    orig = pallas_train_attention.supported
    try:
        pallas_train_attention.supported = lambda *a, **k: False
        out_fb = layer.apply({"params": params}, proc, mask, deterministic=True)
    finally:
        pallas_train_attention.supported = orig

    valid = np.asarray(make_padding_mask(lengths, L))  # (B, L)
    d = np.abs(np.asarray(out_kernel) - np.asarray(out_fb))  # (B, C, L, E)
    d_valid = d[np.broadcast_to(valid[:, None, :, None], d.shape)]
    assert d_valid.max() < 2e-5


def test_kernel_dropout_matches_reference_math():
    """With a fixed keep mask, the kernel's dropout fold equals the
    reference softmax->mask->scale math (fwd + grads)."""
    n_pairs, bh, L, hd = 2, 8, 128, 8
    G = n_pairs * bh
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(G, L, hd)) * 0.4, jnp.float32)
    k = jnp.asarray(rng.normal(size=(G, L, hd)) * 0.4, jnp.float32)
    v = jnp.asarray(rng.normal(size=(G, L, hd)), jnp.float32)
    keep = jnp.asarray(
        (rng.uniform(size=(n_pairs, L, L)) > 0.2).astype(np.float32)
    ) / 0.8

    def ref(q, k, v):
        s = jnp.einsum("gqd,gkd->gqk", q, k)
        s = jnp.where(jnp.tril(jnp.ones((L, L), bool)), s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("gqk,gkd->gqd", p * jnp.repeat(keep, bh, axis=0), v)

    out_ref = ref(q, k, v)
    out_ker = pallas_train_attention.fused_causal_attend(q, k, v, keep, n_pairs)
    np.testing.assert_allclose(
        np.asarray(out_ker), np.asarray(out_ref), atol=2e-5
    )

    gr = jax.grad(lambda *a: jnp.sum(jnp.cos(ref(*a))), argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(
        lambda *a: jnp.sum(
            jnp.cos(pallas_train_attention.fused_causal_attend(*a, keep, n_pairs))
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
