"""Golden tests for the Pallas flash decode-attention (ops/pallas_attention.py).

Off-TPU the kernel runs in interpret mode, so the real kernel body is
exercised on the CPU mesh. Reference semantics: the XLA broadcast-multiply
attend of models/transformer.py make_fast_generate (itself parity-tested
against the module path, which rebuilds transformer/models.py:391-427).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artspeech_tpu.models.transformer import ArtSpeechTransformer, make_fast_generate
from artspeech_tpu.ops.pallas_attention import S_CHUNK, flash_decode_attend, supported

S, HD, G = 64, 16, 256


def _xla_attend(k, v, q, t, p_end):
    kp, vp = k[:p_end].astype(jnp.float32), v[:p_end].astype(jnp.float32)
    t_bias = jnp.where(jnp.arange(p_end) <= t, 0.0, jnp.finfo(jnp.float32).min)
    logits = jnp.sum(kp * q[None], axis=1) + t_bias[:, None]
    attn = jax.nn.softmax(logits, axis=0)
    return jnp.sum(vp * attn[:, None, :], axis=0)


def _inputs(dtype):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(k1, (S, HD, G)).astype(dtype)
    v = jax.random.normal(k2, (S, HD, G)).astype(dtype)
    q = jax.random.normal(k3, (HD, G), jnp.float32)
    return k, v, q


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("p_end", [S_CHUNK, S])
def test_matches_xla_attend(cache_dtype, p_end):
    k, v, q = _inputs(cache_dtype)
    for t in (0, 5, p_end - 1):
        ref = np.asarray(_xla_attend(k, v, q, t, p_end))
        got = np.asarray(flash_decode_attend(k, v, q, t, p_end))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_traced_t_under_scan():
    """t arrives as a traced scalar inside the decode scan — the scalar
    prefetch must handle that (not just concrete ints)."""
    k, v, q = _inputs(jnp.float32)

    def body(carry, t):
        return carry, jnp.sum(flash_decode_attend(k, v, q, t, S))

    _, got = jax.lax.scan(body, 0, jnp.arange(0, S, 17))
    ref = jnp.stack([jnp.sum(_xla_attend(k, v, q, t, S)) for t in range(0, S, 17)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_supported_gate():
    assert supported(64, 16, 1536)
    assert not supported(63, 16, 1536)   # prefix not chunk-divisible
    assert not supported(64, 12, 1536)   # head dim not sublane-aligned
    assert not supported(64, 16, 1440)   # B=4 inter width: no lane divisor


def test_decode_flash_equals_xla_end_to_end():
    """Full fast_generate with the kernel dispatched on the inter attends
    matches the XLA attends through the whole autoregressive feedback."""
    b, s, c = 8, 32, 5
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 16, (b, s)), jnp.int32)
    tgt0 = jnp.asarray(rng.uniform(size=(b, s, c, 100)).astype(np.float32))
    lengths = jnp.full((b,), s, jnp.int32)
    tr = ArtSpeechTransformer(vocab_size=16, num_articulators=c)
    params = tr.init(jax.random.PRNGKey(0), src, tgt0, lengths, lengths)["params"]
    # G_inter = b*c*(c-1)*heads = 640 (kernel-supported); G_self = 160 (xla)
    assert supported(s, 16, b * c * (c - 1) * 4)
    out_xla = make_fast_generate(tr, attend_impl="xla")(params, src, lengths)
    out_flash = make_fast_generate(tr, attend_impl="flash")(params, src, lengths)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=5e-5
    )
