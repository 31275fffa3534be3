"""Golden parity: ChannelProcessingLayer vs its torch equivalent.

The reference block (transformer/models.py:37-100) is shared-LN -> Q/K/V
MLPs -> nn.MultiheadAttention -> query residual. This test loads the SAME
weights into both implementations, validating the flax MHA head layout,
scaling and in/out projection conventions against torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn

from artspeech_tpu.models.transformer import ChannelProcessingLayer

E, H = 16, 4


class TorchChannelProcessingLayer(tnn.Module):
    """Reference transformer/models.py:37-100 architecture (test fixture)."""

    def __init__(self):
        super().__init__()
        self.query = tnn.Sequential(tnn.Linear(E, E), tnn.ReLU())
        self.key = tnn.Sequential(tnn.Linear(E, E), tnn.ReLU())
        self.value = tnn.Sequential(tnn.Linear(E, E), tnn.ReLU())
        self.multihead_attn = tnn.MultiheadAttention(E, H, batch_first=True)
        self.layer_norm = tnn.LayerNorm(E)

    def forward(self, src, tgt, attn_mask=None):
        src = self.layer_norm(src)
        tgt = self.layer_norm(tgt)
        q = self.query(tgt)
        k = self.key(src)
        v = self.value(src)
        out, _ = self.multihead_attn(q, k, v, attn_mask=attn_mask)
        return q + out


def _convert(t_layer):
    """torch block weights -> flax ChannelProcessingLayer params."""

    def linear(seq):
        lin = seq[0]
        return {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }

    mha = t_layer.multihead_attn
    in_w = mha.in_proj_weight.detach().numpy()  # (3E, E)
    in_b = mha.in_proj_bias.detach().numpy()
    head_dim = E // H

    def qkv(idx):
        w = in_w[idx * E : (idx + 1) * E].T  # (E, E) in->out
        b = in_b[idx * E : (idx + 1) * E]
        return {
            "kernel": jnp.asarray(w.reshape(E, H, head_dim)),
            "bias": jnp.asarray(b.reshape(H, head_dim)),
        }

    out_w = mha.out_proj.weight.detach().numpy()  # (E, E): out = W @ concat
    return {
        "LayerNorm_0": {
            "scale": jnp.asarray(t_layer.layer_norm.weight.detach().numpy()),
            "bias": jnp.asarray(t_layer.layer_norm.bias.detach().numpy()),
        },
        "Dense_0": linear(t_layer.query),
        "Dense_1": linear(t_layer.key),
        "Dense_2": linear(t_layer.value),
        "MultiHeadDotProductAttention_0": {
            "query": qkv(0),
            "key": qkv(1),
            "value": qkv(2),
            "out": {
                "kernel": jnp.asarray(out_w.T.reshape(H, head_dim, E)),
                "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
            },
        },
    }


def test_channel_processing_layer_matches_torch():
    torch.manual_seed(0)
    t_layer = TorchChannelProcessingLayer().eval()
    src = torch.randn(2, 7, E)
    tgt = torch.randn(2, 5, E)
    with torch.no_grad():
        ref = t_layer(src, tgt)

    layer = ChannelProcessingLayer(embed_dim=E, num_heads=H)
    params = _convert(t_layer)
    out = layer.apply(
        {"params": params}, jnp.asarray(src.numpy()), jnp.asarray(tgt.numpy())
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_channel_processing_layer_causal_mask_matches_torch():
    torch.manual_seed(1)
    t_layer = TorchChannelProcessingLayer().eval()
    x = torch.randn(2, 6, E)
    causal_t = torch.triu(torch.ones(6, 6, dtype=torch.bool), diagonal=1)
    with torch.no_grad():
        ref = t_layer(x, x, attn_mask=causal_t)

    layer = ChannelProcessingLayer(embed_dim=E, num_heads=H)
    params = _convert(t_layer)
    causal_j = jnp.tril(jnp.ones((6, 6), bool))[None, None]  # True = keep
    out = layer.apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        jnp.asarray(x.numpy()),
        causal_j,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


class TorchEncoderLayerFixture(tnn.Module):
    def __init__(self, ff_dim=32):
        super().__init__()
        self.layer = tnn.TransformerEncoderLayer(
            d_model=E, nhead=H, dim_feedforward=ff_dim, dropout=0.0,
            batch_first=True,
        )

    def forward(self, x):
        return self.layer(x)


def test_encoder_layer_matches_torch():
    """Post-LN TransformerEncoderLayer parity with shared weights."""
    from artspeech_tpu.models.transformer import TransformerEncoderLayer

    torch.manual_seed(0)
    fixture = TorchEncoderLayerFixture().eval()
    tl = fixture.layer
    x = torch.randn(2, 6, E)
    with torch.no_grad():
        ref = fixture(x)

    head_dim = E // H
    in_w = tl.self_attn.in_proj_weight.detach().numpy()
    in_b = tl.self_attn.in_proj_bias.detach().numpy()

    def qkv(idx):
        return {
            "kernel": jnp.asarray(in_w[idx * E : (idx + 1) * E].T.reshape(E, H, head_dim)),
            "bias": jnp.asarray(in_b[idx * E : (idx + 1) * E].reshape(H, head_dim)),
        }

    params = {
        "MultiHeadDotProductAttention_0": {
            "query": qkv(0),
            "key": qkv(1),
            "value": qkv(2),
            "out": {
                "kernel": jnp.asarray(
                    tl.self_attn.out_proj.weight.detach().numpy().T.reshape(H, head_dim, E)
                ),
                "bias": jnp.asarray(tl.self_attn.out_proj.bias.detach().numpy()),
            },
        },
        "LayerNorm_0": {
            "scale": jnp.asarray(tl.norm1.weight.detach().numpy()),
            "bias": jnp.asarray(tl.norm1.bias.detach().numpy()),
        },
        "Dense_0": {
            "kernel": jnp.asarray(tl.linear1.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.linear1.bias.detach().numpy()),
        },
        "Dense_1": {
            "kernel": jnp.asarray(tl.linear2.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.linear2.bias.detach().numpy()),
        },
        "LayerNorm_1": {
            "scale": jnp.asarray(tl.norm2.weight.detach().numpy()),
            "bias": jnp.asarray(tl.norm2.bias.detach().numpy()),
        },
    }
    layer = TransformerEncoderLayer(embed_dim=E, num_heads=H, ff_dim=32, dropout=0.0)
    out = layer.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)
