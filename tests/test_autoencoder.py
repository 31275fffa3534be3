"""Autoencoder / principal-components family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from artspeech_tpu.core.constants import (
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE_MIDLINE,
    TONGUE,
    UPPER_INCISOR,
    UPPER_LIP,
)
from artspeech_tpu.models.autoencoder import (
    MultiArticulatorAutoencoder,
    MultiDecoder,
    MultiEncoder,
    latent_size_of,
    normalize_indices_dict,
)

INDICES = {"tongue": 4, "lower-lip": 2, "upper-lip": 2}
ARTS = sorted(INDICES.keys())
IN_F = 40


def test_indices_dict_normalization():
    # insertion order, like reference helpers.py:94-114
    d = normalize_indices_dict(INDICES)
    assert d["tongue"] == [0, 1, 2, 3]
    assert d["lower-lip"] == [4, 5]
    assert d["upper-lip"] == [6, 7]
    assert latent_size_of(d) == 8


def test_multi_encoder_decoder_shapes_and_slots():
    enc = MultiEncoder(indices_dict=INDICES, in_features=IN_F, hidden_features=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, len(ARTS), IN_F)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {f"enc_{a}" for a in ARTS}
    z = enc.apply({"params": params}, x)
    assert z.shape == (3, 8)
    assert np.isfinite(np.asarray(z)).all()  # -inf slots all filled

    dec = MultiDecoder(indices_dict=INDICES, in_features=IN_F, hidden_features=16)
    dparams = dec.init(jax.random.PRNGKey(1), z)["params"]
    out = dec.apply({"params": dparams}, z)
    assert out.shape == (3, len(ARTS), IN_F)

    # Decoder for articulator i only reads its own latent slots.
    d = normalize_indices_dict(INDICES)
    z2 = z.at[:, jnp.asarray(d["tongue"])].set(0.0)
    out2 = dec.apply({"params": dparams}, z2)
    i_tongue = ARTS.index("tongue")
    for i, art in enumerate(ARTS):
        same = np.allclose(np.asarray(out2[:, i]), np.asarray(out[:, i]))
        assert same == (i != i_tongue)


def test_shared_latent_slots_max_merge():
    """Two articulators sharing a slot -> element-wise max (reference
    autoencoder.py:166-170)."""
    shared = {"a": [0, 1], "b": [1, 2]}
    enc = MultiEncoder(indices_dict=shared, in_features=8, hidden_features=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2, 8)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    z = enc.apply({"params": params}, x)
    za = enc.apply({"params": params}, x)  # deterministic
    assert z.shape == (5, 3)
    # slot 1 must be >= each individual encoder's contribution: recompute
    # by zeroing one encoder is complex; at least check finiteness/shape.
    assert np.isfinite(np.asarray(z)).all()
    np.testing.assert_allclose(np.asarray(z), np.asarray(za))


def test_autoencoder_trains():
    from artspeech_tpu.losses.autoencoder import regularized_latents_mse_loss
    from artspeech_tpu.train.pc_step import (
        make_autoencoder_eval_step,
        make_autoencoder_train_step,
    )
    from artspeech_tpu.train.state import TrainState

    d = normalize_indices_dict(INDICES)
    model = MultiArticulatorAutoencoder(
        indices_dict=INDICES, in_features=IN_F, hidden_features=16
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, len(ARTS), IN_F)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2)
    )
    denorm_mean = np.zeros((len(ARTS), 2, IN_F // 2), np.float32)
    denorm_std = np.ones((len(ARTS), 2, IN_F // 2), np.float32)
    step = make_autoencoder_train_step(
        model, d, alpha=0.1, denorm_mean=jnp.asarray(denorm_mean),
        denorm_std=jnp.asarray(denorm_std), to_mm=220.0, donate=False,
        with_p2cp=True,
    )
    batch = {"inputs": jnp.asarray(x), "weights": jnp.ones((16,))}
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8
    assert np.isfinite(m["p2cp_mm"])


def test_offdiag_cov_penalty():
    from artspeech_tpu.losses.autoencoder import offdiag_cov_penalty

    rng = np.random.default_rng(0)
    z_ind = rng.normal(size=(500, 4)).astype(np.float32)
    d = {"a": [0, 1], "b": [2, 3]}
    pen_ind = float(offdiag_cov_penalty(jnp.asarray(z_ind), d))
    # correlated latents within block "a"
    z_corr = z_ind.copy()
    z_corr[:, 1] = z_corr[:, 0] * 0.9 + 0.1 * z_corr[:, 1]
    pen_corr = float(offdiag_cov_penalty(jnp.asarray(z_corr), d))
    assert pen_corr > pen_ind * 10

    # hand value for a known 2-var block
    z = np.stack([np.array([1.0, 2, 3, 4]), np.array([2.0, 4, 6, 8])], axis=1)
    cov01 = np.cov(z.T)[0, 1]
    expected = 2 * cov01**2  # two off-diagonal entries
    got = float(offdiag_cov_penalty(jnp.asarray(z, jnp.float32), {"x": [0, 1]}))
    assert got == pytest.approx(expected, rel=1e-4)


def test_critical_loss():
    from artspeech_tpu.losses.autoencoder import critical_loss

    arts = sorted([LOWER_LIP, UPPER_LIP, TONGUE, SOFT_PALATE_MIDLINE, PHARYNX])
    B, T, D = 2, 4, 10
    shapes = np.zeros((B, T, len(arts), 2, D), np.float32)
    # put lips 0.5 apart on critical frames, 2.0 apart elsewhere
    i_ll, i_ul = arts.index(LOWER_LIP), arts.index(UPPER_LIP)
    shapes[..., i_ll, 1, :] = 0.0
    shapes[..., i_ul, 1, :] = 2.0
    shapes[:, 0, i_ul, 1, :] = 0.5  # critical frame distance
    refs = np.full((B, T, 1, 2, D), 5.0, np.float32)  # far away incisor
    mask = np.zeros((B, 1, T), np.int32)
    mask[:, 0, 0] = 1  # only frame 0 critical for LA
    loss = float(
        critical_loss(
            jnp.asarray(shapes), jnp.asarray(refs), jnp.asarray(mask), ["LA"], arts
        )
    )
    assert loss == pytest.approx(0.5, abs=1e-5)
    # empty TVs -> 0
    zero = float(
        critical_loss(
            jnp.asarray(shapes), jnp.asarray(refs), jnp.asarray(mask), [], arts
        )
    )
    assert zero == 0.0


def test_pca_fit_roundtrip():
    from artspeech_tpu.ops.pca import fit_pca
    from artspeech_tpu.models.autoencoder import PCADecoder, PCAEncoder

    rng = np.random.default_rng(0)
    # low-rank data: 3 latent dims in 20-dim space
    basis = rng.normal(size=(3, 20))
    z = rng.normal(size=(200, 3))
    x = (z @ basis + 5.0).astype(np.float32)
    pca = fit_pca(x, 3)
    assert pca["eigenvectors"].shape == (3, 20)

    enc = PCAEncoder(in_features=20, num_components=3)
    dec = PCADecoder(out_features=20, num_components=3)
    enc_params = {
        "mean": jnp.asarray(pca["mean"]),
        "eigenvectors": jnp.asarray(pca["eigenvectors"]),
        "eigenvalues": jnp.asarray(pca["eigenvalues"]),
    }
    latents = enc.apply({"params": enc_params}, jnp.asarray(x))
    recon = dec.apply({"params": enc_params}, latents)
    err = np.abs(np.asarray(recon) - x).max()
    assert err < 1e-2  # exact up to float32 for truly rank-3 data


def test_latent_rnn_and_composite_loss():
    from artspeech_tpu.losses.autoencoder import make_autoencoder_loss
    from artspeech_tpu.models.latent_rnn import PrincipalComponentsArtSpeech
    from artspeech_tpu.train.pc_step import (
        make_latent_rnn_eval_step,
        make_latent_rnn_train_step,
    )
    from artspeech_tpu.train.state import create_train_state

    indices = normalize_indices_dict(INDICES)
    latent = latent_size_of(indices)
    n_samples = IN_F // 2
    B, T = 2, 8

    # frozen AE
    enc = MultiEncoder(indices_dict=INDICES, in_features=IN_F, hidden_features=16)
    dec = MultiDecoder(indices_dict=INDICES, in_features=IN_F, hidden_features=16)
    xflat = jnp.zeros((1, len(ARTS), IN_F))
    enc_params = enc.init(jax.random.PRNGKey(0), xflat)["params"]
    dec_params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, latent)))["params"]
    encode_fn = lambda x: jnp.tanh(enc.apply({"params": enc_params}, x))
    decode_fn = lambda z: dec.apply({"params": dec_params}, z)

    denorm_mean = jnp.zeros((len(ARTS), 2, n_samples))
    denorm_std = jnp.ones((len(ARTS), 2, n_samples))
    loss_fn = make_autoencoder_loss(
        encode_fn,
        decode_fn,
        ["LA"],
        ARTS,
        beta1=0.5,
        beta2=3.0,
        beta3=1.0,
        denorm_mean=denorm_mean,
        denorm_std=denorm_std,
    )

    model = PrincipalComponentsArtSpeech(
        vocab_size=10, indices_dict=INDICES, hidden_size=16
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 10, (B, T)), jnp.int32)
    lengths = jnp.asarray([T, 5], jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-3)

    out = model.apply({"params": state.params}, tokens, lengths)
    assert out.shape == (B, T, latent)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh

    batch = {
        "tokens": tokens,
        "lengths": lengths,
        "targets": jnp.asarray(
            np.random.default_rng(1).normal(size=(B, T, len(ARTS), 2, n_samples)),
            jnp.float32,
        ),
        "references": jnp.full((B, T, 1, 2, n_samples), 0.5),
        "critical_masks": jnp.ones((B, 1, T), jnp.int32),
        "voicing": jnp.zeros((B, T)),
    }
    train_step = make_latent_rnn_train_step(
        model, loss_fn, decode_fn, denorm_mean, denorm_std, to_mm=220.0,
        donate=False, with_p2cp=True,
    )
    losses = []
    for i in range(10):
        state, m = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(float(m["p2cp_mm"]))

    eval_step = make_latent_rnn_eval_step(
        model, loss_fn, decode_fn, denorm_mean, denorm_std, to_mm=220.0
    )
    metrics, pcs = eval_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_nomograms():
    from artspeech_tpu.eval.autoencoder import nomograms

    indices = normalize_indices_dict(INDICES)
    latent = latent_size_of(indices)
    dec = MultiDecoder(indices_dict=INDICES, in_features=IN_F, hidden_features=16)
    dec_params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, latent)))["params"]
    decode_fn = lambda z: dec.apply({"params": dec_params}, z)
    denorm_mean = np.zeros((len(ARTS), 2, IN_F // 2), np.float32)
    denorm_std = np.ones((len(ARTS), 2, IN_F // 2), np.float32)
    noms = nomograms(decode_fn, latent, indices, denorm_mean, denorm_std)
    assert set(noms.keys()) == set(range(latent))
    assert noms[0].shape == (9, len(ARTS), 2, IN_F // 2)


def test_regularized_latents_loss_ignores_dummy_rows():
    from artspeech_tpu.losses.autoencoder import regularized_latents_mse_loss
    from artspeech_tpu.train.pc_step import reconstruction_p2cp_mm

    d = normalize_indices_dict(INDICES)
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(4, 3, 8)).astype(np.float32))
    lat = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(4, 3, 8)).astype(np.float32))
    w = jnp.asarray([1.0, 3.0, 0.1, 1.0])
    full = regularized_latents_mse_loss(out, lat, tgt, d, alpha=0.1, sample_weights=w)

    pad = lambda x: jnp.concatenate([x, jnp.zeros_like(x)], axis=0)
    padded = regularized_latents_mse_loss(
        pad(out), pad(lat), pad(tgt), d, alpha=0.1, sample_weights=pad(w)
    )
    np.testing.assert_allclose(float(padded), float(full), rtol=1e-5)

    m = jnp.zeros((3, 2, 4))
    s = jnp.ones((3, 2, 4))
    r_full = reconstruction_p2cp_mm(out, tgt, m, s, to_mm=1.0, weights=w)
    r_padded = reconstruction_p2cp_mm(
        pad(out), pad(tgt), m, s, to_mm=1.0, weights=pad(w)
    )
    np.testing.assert_allclose(float(r_padded), float(r_full), rtol=1e-5)
