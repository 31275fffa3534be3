"""Golden tests for the fused Pallas GRU time-loop (ops/pallas_gru.py).

Off-TPU the kernels run in interpret mode, so these tests exercise the real
kernel bodies on the CPU mesh. Reference: ops/gru.py:_gru_scan, itself
torch-parity-tested (tests/test_gru_torch_parity.py) against nn.GRU +
pack_padded_sequence (reference encoder_decoder/models.py:111).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artspeech_tpu.ops import pallas_gru
from artspeech_tpu.ops.gru import _gru_scan
from artspeech_tpu.ops.pallas_gru import gru_sequence, supported

T, B, H = 16, 64, 128


def _inputs(dtype):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    xp = (jax.random.normal(k1, (T, B, 3 * H)) * 0.5).astype(dtype)
    wh = (jax.random.normal(k2, (H, 3 * H)) * 0.1).astype(dtype)
    bh = (jax.random.normal(k3, (3 * H,)) * 0.1).astype(dtype)
    lengths = jax.random.randint(k4, (B,), 3, T + 1)
    mask = jnp.arange(T)[:, None] < lengths[None, :]  # (T, B) time-major
    return xp, wh, bh, mask


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_scan_exactly(reverse):
    xp, wh, bh, mask = _inputs(jnp.float32)
    ref = _gru_scan(xp, wh, bh, mask, H, time_major=True, reverse=reverse)
    got = gru_sequence(xp, wh, bh, mask.astype(xp.dtype), reverse=reverse)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("reverse", [False, True])
def test_gradients_match_scan(reverse):
    xp, wh, bh, mask = _inputs(jnp.float32)
    mask_f = mask.astype(xp.dtype)

    def loss_ref(xp, wh, bh):
        ys = _gru_scan(xp, wh, bh, mask, H, time_major=True, reverse=reverse)
        return jnp.sum(jnp.sin(ys) * mask[:, :, None])

    def loss_got(xp, wh, bh):
        ys = gru_sequence(xp, wh, bh, mask_f, reverse=reverse)
        return jnp.sum(jnp.sin(ys) * mask[:, :, None])

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, wh, bh)
    gg = jax.grad(loss_got, argnums=(0, 1, 2))(xp, wh, bh)
    for a, b in zip(gr, gg):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-4 * max(np.abs(a).max(), 1.0)


def test_masked_rows_freeze_carry():
    """Outputs at padded steps repeat the last valid hidden state."""
    xp, wh, bh, _ = _inputs(jnp.float32)
    lengths = jnp.full((B,), T // 2, jnp.int32)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(xp.dtype)
    ys = gru_sequence(xp, wh, bh, mask)
    ys = np.asarray(ys)
    np.testing.assert_array_equal(
        ys[T // 2 :], np.broadcast_to(ys[T // 2 - 1], ys[T // 2 :].shape)
    )


def test_supported_guards():
    # The production single-chip shapes pass the static checks ...
    assert pallas_gru._spmd_safe() == (len(jax.devices()) == 1)
    static_ok = (
        128 % pallas_gru.CHUNK == 0 and 256 % 8 == 0 and 128 % 128 == 0
    )
    assert static_ok
    # ... and the small thesis batch and odd hidden sizes do not.
    assert not supported(128, 12, 128)   # B=12: fused-direction scan path
    assert not supported(321, 8, 64)     # recognizer GRU: H=64, T=321
    if len(jax.devices()) > 1:
        # On the 8-device suite mesh, auto-GSPMD would replicate the kernel;
        # the guard must keep multi-device auto-dp on the scan path.
        assert not supported(128, 256, 128)


def test_bigru_model_path_matches_scan(monkeypatch):
    """BiGRU's large-batch time-major path gives the same outputs whether the
    recurrence runs as the Pallas kernel or the lax.scan."""
    from artspeech_tpu.ops.gru import BiGRU

    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (B, T, 48))
    lengths = jax.random.randint(jax.random.PRNGKey(2), (B,), 2, T + 1)
    mask = jnp.arange(T)[None, :] < lengths[:, None]  # (B, T) batch-major

    model = BiGRU(hidden_size=H, num_layers=2, fuse_directions=False)
    params = model.init(jax.random.PRNGKey(3), x, mask)

    monkeypatch.setattr(pallas_gru, "_spmd_safe", lambda: False)
    ref = model.apply(params, x, mask)
    monkeypatch.setattr(pallas_gru, "_spmd_safe", lambda: True)
    got = model.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-6)


def test_bf16_matches_f32_loosely():
    xp, wh, bh, mask = _inputs(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    ref = gru_sequence(xp, wh, bh, mask_f)
    got = gru_sequence(
        xp.astype(jnp.bfloat16),
        wh.astype(jnp.bfloat16),
        bh.astype(jnp.bfloat16),
        mask_f.astype(jnp.bfloat16),
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05
    )


# --- LSTM ---


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_forward_matches_scan_exactly(reverse):
    from artspeech_tpu.ops.gru import _lstm_scan
    from artspeech_tpu.ops.pallas_gru import lstm_sequence

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    xp = (jax.random.normal(k1, (T, B, 4 * H)) * 0.5).astype(jnp.float32)
    wh = (jax.random.normal(k2, (H, 4 * H)) * 0.1).astype(jnp.float32)
    bh = (jax.random.normal(k3, (4 * H,)) * 0.1).astype(jnp.float32)
    lengths = jax.random.randint(k4, (B,), 3, T + 1)
    mask = jnp.arange(T)[:, None] < lengths[None, :]

    ref = _lstm_scan(xp, wh, bh, mask, H, time_major=True, reverse=reverse)
    got = lstm_sequence(xp, wh, bh, mask.astype(xp.dtype), reverse=reverse)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_gradients_match_scan(reverse):
    from artspeech_tpu.ops.gru import _lstm_scan
    from artspeech_tpu.ops.pallas_gru import lstm_sequence

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(6), 4)
    xp = (jax.random.normal(k1, (T, B, 4 * H)) * 0.5).astype(jnp.float32)
    wh = (jax.random.normal(k2, (H, 4 * H)) * 0.1).astype(jnp.float32)
    bh = (jax.random.normal(k3, (4 * H,)) * 0.1).astype(jnp.float32)
    lengths = jax.random.randint(k4, (B,), 3, T + 1)
    mask = jnp.arange(T)[:, None] < lengths[None, :]
    mask_f = mask.astype(xp.dtype)

    def loss_ref(xp, wh, bh):
        ys = _lstm_scan(xp, wh, bh, mask, H, time_major=True, reverse=reverse)
        return jnp.sum(jnp.sin(ys) * mask[:, :, None])

    def loss_got(xp, wh, bh):
        ys = lstm_sequence(xp, wh, bh, mask_f, reverse=reverse)
        return jnp.sum(jnp.sin(ys) * mask[:, :, None])

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, wh, bh)
    gg = jax.grad(loss_got, argnums=(0, 1, 2))(xp, wh, bh)
    for a, b in zip(gr, gg):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-4 * max(np.abs(a).max(), 1.0)


def test_bilstm_model_path_matches_scan(monkeypatch):
    from artspeech_tpu.ops.gru import BiLSTM

    k = jax.random.PRNGKey(7)
    x = jax.random.normal(k, (B, T, 48))
    lengths = jax.random.randint(jax.random.PRNGKey(8), (B,), 2, T + 1)
    mask = jnp.arange(T)[None, :] < lengths[:, None]

    model = BiLSTM(hidden_size=H, num_layers=2, fuse_directions=False)
    params = model.init(jax.random.PRNGKey(9), x, mask)

    monkeypatch.setattr(pallas_gru, "_spmd_safe", lambda: False)
    ref = model.apply(params, x, mask)
    monkeypatch.setattr(pallas_gru, "_spmd_safe", lambda: True)
    got = model.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-6)


def test_spmd_safe_inside_shard_map():
    """Inside a shard_map (manual axes) trace the kernel may dispatch even
    with multiple devices; outside, multi-device traces must stay on scan."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    from jax.sharding import PartitionSpec as P

    mesh = jax.make_mesh((len(jax.devices()),), ("data",))
    seen = {}

    def f(x):
        seen["inside"] = pallas_gru._spmd_safe()
        return x * 2

    x = jnp.zeros((len(jax.devices()), 4))
    jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data")))(x)
    assert seen["inside"] is True
    assert pallas_gru._spmd_safe() is False
