"""Golden parity: masked GRU/LSTM scans vs torch nn.GRU/nn.LSTM.

Verifies the gate math and pack_padded semantics claimed in
artspeech_tpu/ops/gru.py by loading the SAME weights into both
implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from artspeech_tpu.ops.gru import BiGRU, GRULayer, LSTMLayer

B, T, E, H = 3, 11, 5, 7


def _copy_gru_weights(t_gru, params, layer="", reverse=False):
    sfx = "_reverse" if reverse else ""
    w_ih = getattr(t_gru, f"weight_ih_l0{sfx}").detach().numpy()  # (3H, E)
    w_hh = getattr(t_gru, f"weight_hh_l0{sfx}").detach().numpy()
    b_ih = getattr(t_gru, f"bias_ih_l0{sfx}").detach().numpy()
    b_hh = getattr(t_gru, f"bias_hh_l0{sfx}").detach().numpy()
    return {
        "wi": jnp.asarray(w_ih.T),
        "bi": jnp.asarray(b_ih),
        "wh": jnp.asarray(w_hh.T),
        "bh": jnp.asarray(b_hh),
    }


def test_gru_layer_matches_torch_full_length():
    t_gru = torch.nn.GRU(E, H, num_layers=1, batch_first=True)
    x = torch.randn(B, T, E)
    with torch.no_grad():
        ref, _ = t_gru(x)

    layer = GRULayer(hidden_size=H)
    params = _copy_gru_weights(t_gru, None)
    mask = jnp.ones((B, T), bool)
    out = layer.apply({"params": params}, jnp.asarray(x.numpy()), mask)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gru_layer_masking_matches_pack_padded():
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    t_gru = torch.nn.GRU(E, H, num_layers=1, batch_first=True)
    lengths = [T, 7, 3]
    x = torch.randn(B, T, E)
    with torch.no_grad():
        packed = pack_padded_sequence(x, lengths, batch_first=True)
        ref_packed, _ = t_gru(packed)
        ref, _ = pad_packed_sequence(ref_packed, batch_first=True, total_length=T)

    layer = GRULayer(hidden_size=H)
    params = _copy_gru_weights(t_gru, None)
    mask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    out = np.asarray(layer.apply({"params": params}, jnp.asarray(x.numpy()), mask))
    # valid region matches pack_padded output exactly
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            out[b, :L], ref.numpy()[b, :L], rtol=1e-4, atol=1e-5
        )


def test_bigru_matches_torch_bidirectional():
    t_gru = torch.nn.GRU(E, H, num_layers=1, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, E)
    with torch.no_grad():
        ref, _ = t_gru(x)

    model = BiGRU(hidden_size=H, num_layers=1)
    params = {
        "GRULayer_0": _copy_gru_weights(t_gru, None, reverse=False),
        "GRULayer_1": _copy_gru_weights(t_gru, None, reverse=True),
    }
    mask = jnp.ones((B, T), bool)
    out = model.apply({"params": params}, jnp.asarray(x.numpy()), mask)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_layer_matches_torch():
    t_lstm = torch.nn.LSTM(E, H, num_layers=1, batch_first=True)
    x = torch.randn(B, T, E)
    with torch.no_grad():
        ref, _ = t_lstm(x)

    layer = LSTMLayer(hidden_size=H)
    params = {
        "wi": jnp.asarray(t_lstm.weight_ih_l0.detach().numpy().T),
        "bi": jnp.asarray(t_lstm.bias_ih_l0.detach().numpy()),
        "wh": jnp.asarray(t_lstm.weight_hh_l0.detach().numpy().T),
        "bh": jnp.asarray(t_lstm.bias_hh_l0.detach().numpy()),
    }
    mask = jnp.ones((B, T), bool)
    out = layer.apply({"params": params}, jnp.asarray(x.numpy()), mask)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_torch_rnn_init_symmetric():
    """Weights/biases init ~ U(-1/sqrt(H), 1/sqrt(H)) like torch, not [0, s)."""
    import jax

    from artspeech_tpu.ops.gru import GRULayer

    layer = GRULayer(hidden_size=64)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32)), jnp.ones((1, 4), bool)
    )["params"]
    bound = 1.0 / 8.0
    for name in ("wi", "wh", "bi", "bh"):
        w = np.asarray(params[name])
        assert w.min() < -bound * 0.5, name  # negative mass present
        assert abs(w.mean()) < bound * 0.2, name  # roughly zero-centered
        assert np.abs(w).max() <= bound + 1e-6, name


def test_direction_fused_scan_matches_twin_scans():
    """BiGRU/BiLSTM fuse_directions=True (one stacked-direction scan) must
    be bit-identical to the twin-scan path on the same params, including
    ragged masks (the fused carry freezes per-direction at padded steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artspeech_tpu.ops.gru import BiGRU, BiLSTM

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 9, 6)).astype(np.float32))
    mask = jnp.asarray(np.arange(9)[None, :] < np.array([[9], [5], [7]]))
    for cls in (BiGRU, BiLSTM):
        fused = cls(hidden_size=8, num_layers=2, fuse_directions=True)
        twin = cls(hidden_size=8, num_layers=2, fuse_directions=False)
        params = fused.init(jax.random.PRNGKey(0), x, mask)["params"]
        # identical param trees: the fused path declares via project_only
        ref = twin.init(jax.random.PRNGKey(0), x, mask)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref)
        out_f = fused.apply({"params": params}, x, mask)
        out_t = twin.apply({"params": params}, x, mask)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_t), atol=1e-6,
            err_msg=cls.__name__,
        )
