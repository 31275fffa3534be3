"""Tests for GRU ops, ArtSpeech model, losses and the train step."""

import numpy as np
import jax
import jax.numpy as jnp

from artspeech_tpu.models import ArtSpeech, SimpleArtSpeech
from artspeech_tpu.losses import masked_euclidean_loss, p2cp_distance_mm
from artspeech_tpu.ops.gru import BiGRU, GRULayer
from artspeech_tpu.train import (
    EarlyStopping,
    PlateauScheduler,
    create_train_state,
    get_learning_rate,
    make_artspeech_eval_step,
    make_artspeech_train_step,
    set_learning_rate,
)


def test_gru_matches_torch():
    """Gate math parity with torch.nn.GRU on a full-length sequence."""
    import torch

    B, T, E, H = 2, 5, 3, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, E)).astype(np.float32)

    tg = torch.nn.GRU(E, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        out_t, _ = tg(torch.from_numpy(x))
    out_t = out_t.numpy()

    layer = GRULayer(hidden_size=H)
    params = layer.init(jax.random.PRNGKey(0), jnp.array(x), jnp.ones((B, T), bool))
    # Port torch weights: torch weight_ih_l0 is (3H, E) in r,z,n order.
    wi = tg.weight_ih_l0.detach().numpy().T
    wh = tg.weight_hh_l0.detach().numpy().T
    bi = tg.bias_ih_l0.detach().numpy()
    bh = tg.bias_hh_l0.detach().numpy()
    params = {"params": {"wi": wi, "bi": bi, "wh": wh, "bh": bh}}
    out_j = np.asarray(layer.apply(params, jnp.array(x), jnp.ones((B, T), bool)))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


def test_gru_mask_freezes_state():
    """Outputs beyond each sequence's length must be zero (pack_padded parity)."""
    B, T, E, H = 3, 6, 4, 5
    x = jnp.array(np.random.default_rng(1).normal(size=(B, T, E)), jnp.float32)
    lengths = jnp.array([6, 3, 1])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    layer = GRULayer(hidden_size=H)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    out = np.asarray(layer.apply(params, x, mask))
    # Valid region nonzero, padded region == last valid hidden state.
    assert np.abs(out[1, 3:] - out[1, 2:3]).max() < 1e-6
    # Truncated vs full: prefix outputs identical.
    out_trunc = np.asarray(layer.apply(params, x[:, :3], mask[:, :3]))
    np.testing.assert_allclose(out[:, :3], out_trunc, rtol=1e-5, atol=1e-6)


def test_bigru_reverse_respects_lengths():
    """Backward direction must start at t=len-1, not at the padding."""
    B, T, E, H = 2, 8, 4, 3
    rng = np.random.default_rng(2)
    x = jnp.array(rng.normal(size=(B, T, E)), jnp.float32)
    lengths = jnp.array([8, 5])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    model = BiGRU(hidden_size=H, num_layers=1)
    params = model.init(jax.random.PRNGKey(0), x, mask)
    out = model.apply(params, x, mask)
    # Sequence 1 truncated to its own length must give identical valid outputs.
    out_trunc = model.apply(params, x[1:2, :5], mask[1:2, :5])
    np.testing.assert_allclose(
        np.asarray(out)[1:2, :5], np.asarray(out_trunc), rtol=1e-5, atol=1e-6
    )


def test_artspeech_output_shape_and_range():
    model = ArtSpeech(vocab_size=20, n_articulators=10)
    tokens = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    lengths = jnp.array([4, 2])
    params = model.init(jax.random.PRNGKey(0), tokens, lengths)
    out = np.asarray(model.apply(params, tokens, lengths))
    assert out.shape == (2, 4, 10, 2, 50)
    assert (out >= 0).all() and (out <= 1).all()


def test_masked_loss_ignores_padding():
    rng = np.random.default_rng(3)
    out = jnp.array(rng.uniform(size=(2, 6, 3, 2, 5)), jnp.float32)
    tgt = jnp.array(rng.uniform(size=(2, 6, 3, 2, 5)), jnp.float32)
    lengths = jnp.array([6, 4])
    base = float(masked_euclidean_loss(out, tgt, lengths))
    # Corrupt padding region only: loss must not change.
    tgt2 = np.asarray(tgt).copy()
    tgt2[1, 4:] = 100.0
    corrupted = float(masked_euclidean_loss(out, jnp.array(tgt2), lengths))
    assert abs(base - corrupted) < 1e-6


def test_p2cp_mm_identity_is_zero():
    x = jnp.array(np.random.default_rng(4).uniform(size=(2, 3, 4, 2, 50)), jnp.float32)
    lengths = jnp.array([3, 2])
    assert float(p2cp_distance_mm(x, x, lengths, to_mm=220.0)) < 1e-5


def test_train_step_p2cp_metric_is_opt_in():
    """The reference computes fn_metrics only in the VALID phase
    (train_phoneme_to_articulation.py:259-284): the default train step must
    report only the loss; with_p2cp=True adds the metric."""
    vocab, n_art, T, D = 12, 3, 6, 50
    rng = np.random.default_rng(11)
    batch = {
        "tokens": jnp.array(rng.integers(0, vocab, size=(2, T))),
        "targets": jnp.array(
            rng.uniform(0.2, 0.8, size=(2, T, n_art, 2, D)), jnp.float32
        ),
        "lengths": jnp.array([6, 4]),
    }
    model = ArtSpeech(
        vocab_size=vocab, n_articulators=n_art, hidden_size=16, embed_dim=8
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch["tokens"], batch["lengths"]), 1e-3
    )
    plain = make_artspeech_train_step(to_mm=220.0, donate=False)
    _, metrics = plain(state, batch, jax.random.PRNGKey(1))
    assert set(metrics) == {"loss", "manual_spmd"}
    assert float(metrics["manual_spmd"]) == 0.0  # auto-GSPMD path marker
    with_metric = make_artspeech_train_step(
        to_mm=220.0, donate=False, with_p2cp=True
    )
    _, metrics2 = with_metric(state, batch, jax.random.PRNGKey(1))
    assert set(metrics2) == {"loss", "p2cp_mm", "manual_spmd"}
    assert float(metrics2["loss"]) == float(metrics["loss"])
    assert np.isfinite(float(metrics2["p2cp_mm"]))


def test_train_step_overfits_tiny_batch():
    """Two-sentence overfit: loss must drop by >3x in 60 steps."""
    vocab, n_art, T, D = 12, 4, 8, 50
    rng = np.random.default_rng(5)
    batch = {
        "tokens": jnp.array(rng.integers(0, vocab, size=(2, T))),
        "targets": jnp.array(rng.uniform(0.2, 0.8, size=(2, T, n_art, 2, D)), jnp.float32),
        "lengths": jnp.array([8, 6]),
    }
    model = ArtSpeech(vocab_size=vocab, n_articulators=n_art, hidden_size=32, embed_dim=16)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["tokens"], batch["lengths"]),
        learning_rate=5e-3,
    )
    train_step = make_artspeech_train_step(to_mm=220.0, donate=False)
    first = None
    for i in range(60):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first / 3.0, (first, last)

    eval_step = make_artspeech_eval_step(to_mm=220.0)
    metrics, outputs = eval_step(state, batch)
    assert outputs.shape == (2, T, n_art, 2, D)
    assert np.isfinite(float(metrics["p2cp_mm"]))


def test_plateau_and_early_stopping():
    model = SimpleArtSpeech(vocab_size=5, n_articulators=2, hidden_size=8, embed_dim=4)
    tokens = jnp.zeros((1, 3), jnp.int32)
    lengths = jnp.array([3])
    state = create_train_state(
        model, jax.random.PRNGKey(0), (tokens, lengths), learning_rate=1e-3
    )
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9

    sched = PlateauScheduler(factor=0.1, patience=1)
    state = sched.step(1.0, state)
    state = sched.step(1.1, state)  # bad 1
    state = sched.step(1.2, state)  # bad 2 -> reduce
    assert abs(get_learning_rate(state) - 5e-5) < 1e-9

    es = EarlyStopping(patience=2)
    assert es.update(1.0)
    assert not es.update(2.0)
    assert not es.update(2.0)
    assert not es.should_stop
    assert not es.update(2.0)
    assert es.should_stop


def test_bfloat16_forward():
    """bf16 compute path: finite outputs close to the fp32 forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from artspeech_tpu.models.artspeech_rnn import ArtSpeech

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 10, (2, 12)), jnp.int32)
    lengths = jnp.asarray([12, 7], jnp.int32)

    m32 = ArtSpeech(vocab_size=10, n_articulators=3, hidden_size=16)
    params = m32.init(jax.random.PRNGKey(0), tokens, lengths)["params"]
    out32 = m32.apply({"params": params}, tokens, lengths)

    m16 = ArtSpeech(vocab_size=10, n_articulators=3, hidden_size=16, dtype=jnp.bfloat16)
    out16 = m16.apply({"params": params}, tokens, lengths)
    assert np.isfinite(np.asarray(out16, np.float32)).all()
    # sigmoid outputs: bf16 recurrent accumulation drifts ~4e-2 worst case
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=8e-2
    )
    assert float(np.abs(np.asarray(out16, np.float32) - np.asarray(out32)).mean()) < 5e-3


def test_p2cp_metric_ignores_dummy_rows():
    """Bucket-padding dummy sentences (length 0) must not dilute metrics."""
    import jax.numpy as jnp
    import numpy as np
    from artspeech_tpu.losses.articulation import (
        euclidean_distance_mm,
        p2cp_distance_mm,
    )

    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.uniform(size=(2, 6, 3, 2, 10)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(2, 6, 3, 2, 10)).astype(np.float32))
    full = p2cp_distance_mm(out, tgt, jnp.asarray([6, 6]), to_mm=1.0)
    # append two dummy rows
    out_p = jnp.concatenate([out, jnp.zeros_like(out)], axis=0)
    tgt_p = jnp.concatenate([tgt, jnp.zeros_like(tgt)], axis=0)
    padded = p2cp_distance_mm(out_p, tgt_p, jnp.asarray([6, 6, 0, 0]), to_mm=1.0)
    np.testing.assert_allclose(float(padded), float(full), rtol=1e-6)

    med_full = euclidean_distance_mm(out, tgt, jnp.asarray([6, 6]), to_mm=1.0)
    med_padded = euclidean_distance_mm(out_p, tgt_p, jnp.asarray([6, 6, 0, 0]), to_mm=1.0)
    np.testing.assert_allclose(float(med_padded), float(med_full), rtol=1e-6)


def test_bfloat16_dtype_string_knob():
    """configs can opt into bf16 compute via model_kwargs/model_params
    dtype strings (params stay f32; measured 1.25-1.35x step speedups on
    v5e — benchmarks note in BENCH_DETAILS.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.models.deepspeech2 import DeepSpeech2

    tokens = jnp.zeros((2, 6), jnp.int32)
    lengths = jnp.full((2,), 6, jnp.int32)
    model = ArtSpeech(vocab_size=8, n_articulators=3, dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0), tokens, lengths)["params"]
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32  # params stay f32
    out = model.apply({"params": params}, tokens, lengths)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    feats = jnp.zeros((2, 2, 12, 10), jnp.float32)
    ds2 = DeepSpeech2(in_channels=2, num_residual_layers=1, num_rnn_layers=1,
                      rnn_hidden_size=8, num_classes=5, num_features=12,
                      dtype="bfloat16")
    p = ds2.init(jax.random.PRNGKey(0), feats,
                 lengths=jnp.full((2,), 10, jnp.int32))["params"]
    logits = ds2.apply({"params": p}, feats, lengths=jnp.full((2,), 10, jnp.int32))
    assert bool(jnp.isfinite(np.asarray(logits, np.float32)).all())


def test_fused_xy_head_matches_separate_denses():
    """The ArticulatorPredictor's fused (hidden -> 2*n_samples) output matmul
    must be bit-identical — same param tree, init, and values — to the naive
    two-Dense form it replaces (the torch-importer contract)."""
    import flax.linen as nn
    from typing import Optional

    from artspeech_tpu.models.heads import ArticulatorPredictor

    class SeparatePredictor(nn.Module):
        n_samples: int = 50
        hidden: int = 256
        dtype: Optional[jnp.dtype] = None

        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.Dense(self.hidden, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.Dense(self.hidden, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            x_pos = nn.Dense(self.n_samples, dtype=self.dtype)(h)
            y_pos = nn.Dense(self.n_samples, dtype=self.dtype)(h)
            return jnp.stack([x_pos, y_pos], axis=-2)

    rng = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 128)).astype(np.float32))
    old, new = SeparatePredictor(), ArticulatorPredictor()
    po = old.init(rng, x)["params"]
    pn = new.init(rng, x)["params"]
    assert jax.tree_util.tree_structure(po) == jax.tree_util.tree_structure(pn)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(po),
        jax.tree_util.tree_leaves_with_path(pn),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), path
    yo = old.apply({"params": po}, x)
    yn = new.apply({"params": pn}, x)
    assert np.array_equal(np.asarray(yo), np.asarray(yn))
