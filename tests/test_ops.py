"""Golden-value unit tests for ops: distances, B-splines, resampling."""

import numpy as np
import pytest
import jax.numpy as jnp

from artspeech_tpu.ops import (
    arclength_resample,
    euclidean_distance,
    interp1d,
    mean_p2cp,
    pairwise_distances,
    pearson_correlation,
    regularize_bsplines,
    resample_linear_np,
    resample_nearest_np,
)


def test_pairwise_distances_matches_numpy():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(3, 5, 2)).astype(np.float32)
    v = rng.normal(size=(3, 7, 2)).astype(np.float32)
    got = np.asarray(pairwise_distances(jnp.array(u), jnp.array(v)))
    want = np.linalg.norm(u[:, :, None, :] - v[:, None, :, :], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mean_p2cp_golden():
    # u = {(0,0), (1,0)}, v = {(0,1)}:
    # u2cp = [1, sqrt(2)] mean -> (1 + sqrt(2)) / 2 ; v2cp = [1] mean -> 1
    u = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    v = jnp.array([[0.0, 1.0]])
    got = float(mean_p2cp(u, v))
    want = ((1.0 + np.sqrt(2.0)) / 2.0 + 1.0) / 2.0
    assert abs(got - want) < 1e-6


def test_mean_p2cp_is_symmetric():
    rng = np.random.default_rng(1)
    u = jnp.array(rng.normal(size=(10, 2)))
    v = jnp.array(rng.normal(size=(13, 2)))
    assert abs(float(mean_p2cp(u, v)) - float(mean_p2cp(v, u))) < 1e-6


def test_mean_p2cp_matches_bruteforce_cdist():
    # The fused formulation (min over squared distances, sqrt on winners,
    # per-direction derivation) must match naive sqrt-then-min exactly,
    # including D=3 and asymmetric point counts.
    rng = np.random.default_rng(7)
    for n, m, d in ((50, 50, 2), (5, 9, 3), (1, 4, 2)):
        u = rng.normal(size=(2, 3, n, d)).astype(np.float32)
        v = rng.normal(size=(2, 3, m, d)).astype(np.float32)
        dist = np.sqrt(((u[..., :, None, :] - v[..., None, :, :]) ** 2).sum(-1))
        want = (dist.min(-1).mean(-1) + dist.min(-2).mean(-1)) / 2.0
        got = np.asarray(mean_p2cp(jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_mean_p2cp_channel_major_matches_point_major():
    from artspeech_tpu.ops import mean_p2cp_channel_major

    rng = np.random.default_rng(8)
    u = rng.normal(size=(4, 6, 2, 50)).astype(np.float32)
    v = rng.normal(size=(4, 6, 2, 50)).astype(np.float32)
    want = np.asarray(
        mean_p2cp(jnp.swapaxes(jnp.asarray(u), -1, -2), jnp.swapaxes(jnp.asarray(v), -1, -2))
    )
    got = np.asarray(mean_p2cp_channel_major(jnp.asarray(u), jnp.asarray(v)))
    assert np.array_equal(got, want)


def test_min_pairwise_distance_channel_major():
    from artspeech_tpu.ops.distances import min_pairwise_distance_channel_major

    rng = np.random.default_rng(9)
    u = rng.normal(size=(3, 4, 2, 12)).astype(np.float32)
    v = rng.normal(size=(3, 4, 2, 17)).astype(np.float32)
    up = np.swapaxes(u, -1, -2)
    vp = np.swapaxes(v, -1, -2)
    dist = np.sqrt(((up[..., :, None, :] - vp[..., None, :, :]) ** 2).sum(-1))
    want = dist.reshape(3, 4, -1).min(-1)
    got = np.asarray(min_pairwise_distance_channel_major(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_min_distance_sqrt_after_min_golden():
    from artspeech_tpu.ops.distances import min_distance

    u = jnp.array([[[0.0, 0.0], [3.0, 4.0]]])  # (1, 2, 2)
    v = jnp.array([[[6.0, 8.0], [3.0, 3.0]]])
    dist, iu, iv = min_distance(u, v)
    assert abs(float(dist[0]) - 1.0) < 1e-6  # (3,4) -> (3,3)
    assert int(iu[0]) == 1 and int(iv[0]) == 1


def test_euclidean_distance_layout():
    # (..., 2, D) layout as in the reference loss.
    out = jnp.zeros((1, 1, 1, 2, 4))
    tgt = jnp.ones((1, 1, 1, 2, 4))
    got = np.asarray(euclidean_distance(out, tgt))
    np.testing.assert_allclose(got, np.sqrt(2.0) * np.ones((1, 1, 1, 4)), rtol=1e-6)


def test_pearson_correlation_perfect_and_masked():
    t = np.arange(10.0)
    x = jnp.array(t)[None, :]
    y = jnp.array(2.0 * t + 1.0)[None, :]
    assert abs(float(pearson_correlation(x, y, axis=1)[0]) - 1.0) < 1e-5

    # Mask out a corrupted tail: correlation should be 1 again.
    y_bad = np.array(2.0 * t + 1.0)
    y_bad[7:] = -100.0
    mask = jnp.array((t < 7)[None, :])
    got = float(pearson_correlation(x, jnp.array(y_bad)[None, :], mask=mask, axis=1)[0])
    assert abs(got - 1.0) < 1e-5


def test_bspline_regularization_smooths_and_preserves_shape():
    t = np.linspace(0, 2 * np.pi, 50)
    clean = np.stack([np.cos(t), np.sin(t)], axis=1)
    rng = np.random.default_rng(2)
    noisy = clean + 0.05 * rng.normal(size=clean.shape)
    smoothed = np.asarray(regularize_bsplines(jnp.array(noisy)))
    assert smoothed.shape == (50, 2)
    err_noisy = np.linalg.norm(noisy - clean, axis=1).mean()
    err_smooth = np.linalg.norm(smoothed - clean, axis=1).mean()
    assert err_smooth < err_noisy


def test_bspline_regularization_batched():
    rng = np.random.default_rng(3)
    contours = rng.normal(size=(4, 3, 50, 2)).astype(np.float32)
    out = np.asarray(regularize_bsplines(jnp.array(contours)))
    assert out.shape == (4, 3, 50, 2)
    single = np.asarray(regularize_bsplines(jnp.array(contours[1, 2])))
    np.testing.assert_allclose(out[1, 2], single, rtol=1e-4, atol=1e-5)


def test_resample_nearest_matches_torch_semantics():
    pts = np.arange(10.0)[:, None]
    out = resample_nearest_np(pts, 5)
    # floor(i * 10/5) = 0, 2, 4, 6, 8
    np.testing.assert_array_equal(out[:, 0], [0, 2, 4, 6, 8])


def test_resample_linear_endpoints():
    pts = np.stack([np.arange(7.0), np.arange(7.0) ** 2], axis=1)
    out = resample_linear_np(pts, 50)
    np.testing.assert_allclose(out[0], pts[0])
    np.testing.assert_allclose(out[-1], pts[-1])


def test_interp1d_linear():
    x = jnp.array([0.0, 1.0, 2.0])
    y = jnp.array([0.0, 10.0, 20.0])
    q = jnp.array([0.5, 1.5, 2.0])
    np.testing.assert_allclose(np.asarray(interp1d(q, x, y)), [5.0, 15.0, 20.0], atol=1e-6)


def test_arclength_resample_straight_line():
    pts = jnp.array([[0.0, 0.0], [0.1, 0.0], [1.0, 0.0]])
    out = np.asarray(arclength_resample(pts, 11))
    np.testing.assert_allclose(out[:, 0], np.linspace(0, 1, 11), atol=1e-6)
    np.testing.assert_allclose(out[:, 1], np.zeros(11), atol=1e-6)


def test_pallas_p2cp_parity():
    """Pallas kernels (interpret mode on CPU) match the XLA reference."""
    import numpy as np
    import jax.numpy as jnp
    from artspeech_tpu.ops.pallas_kernels import (
        mean_p2cp_pallas,
        min_distance_pallas,
    )
    from artspeech_tpu.ops.distances import mean_p2cp, min_distance, mean_p2cp_auto

    rng = np.random.default_rng(0)
    u = rng.normal(size=(3, 4, 50, 2)).astype(np.float32)
    v = rng.normal(size=(3, 4, 50, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mean_p2cp_pallas(u, v)),
        np.asarray(mean_p2cp(jnp.asarray(u), jnp.asarray(v))),
        rtol=1e-5, atol=1e-6,
    )
    d, iu, iv = min_distance_pallas(u, v)
    d_ref, iu_ref, iv_ref = min_distance(jnp.asarray(u), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-5, atol=1e-6)
    assert (np.asarray(iu) == np.asarray(iu_ref)).all()
    assert (np.asarray(iv) == np.asarray(iv_ref)).all()
    # auto dispatch on CPU hits the XLA path and stays differentiable
    import jax

    g = jax.grad(lambda a: jnp.sum(mean_p2cp_auto(a, jnp.asarray(v))))(jnp.asarray(u))
    assert np.isfinite(np.asarray(g)).all()


def test_mean_p2cp_fast_grad_matches_xla():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from artspeech_tpu.ops.distances import _mean_p2cp_fast, _mean_p2cp_xla

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(2, 10, 2)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 12, 2)).astype(np.float32))
    g_fast = jax.grad(lambda a: jnp.sum(_mean_p2cp_fast(a, v)))(u)
    g_xla = jax.grad(lambda a: jnp.sum(_mean_p2cp_xla(a, v)))(u)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_xla), rtol=1e-5, atol=1e-6)


def test_bspline_basis_matches_scipy():
    """Cox-de Boor design matrix vs scipy.interpolate.BSpline.design_matrix."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    import numpy as np
    from artspeech_tpu.ops.bspline import bspline_basis

    n_points, n_ctrl, degree = 50, 12, 3
    n_knots = n_ctrl + degree + 1
    interior = n_knots - 2 * (degree + 1)
    knots = np.concatenate([
        np.zeros(degree + 1),
        np.linspace(0.0, 1.0, interior + 2)[1:-1],
        np.ones(degree + 1),
    ])
    ts = np.linspace(0.0, 1.0, n_points)
    ref = scipy_interp.BSpline.design_matrix(
        ts, knots, degree, extrapolate=True
    ).toarray()[:, :n_ctrl]
    ours = bspline_basis(n_points, n_ctrl, degree)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_bspline_projection_matches_scipy_lsq():
    """The fixed projection equals scipy's least-squares B-spline fit."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    import numpy as np
    from artspeech_tpu.ops.bspline import (
        bspline_basis,
        bspline_projection,
        regularize_bsplines,
    )

    n_points, n_ctrl, degree = 50, 12, 3
    rng = np.random.default_rng(0)
    contour = np.cumsum(rng.normal(size=(n_points, 2)), axis=0).astype(np.float64)
    ts = np.linspace(0.0, 1.0, n_points)
    n_knots = n_ctrl + degree + 1
    interior = n_knots - 2 * (degree + 1)
    knots = np.concatenate([
        np.zeros(degree + 1),
        np.linspace(0.0, 1.0, interior + 2)[1:-1],
        np.ones(degree + 1),
    ])
    lsq = scipy_interp.make_lsq_spline(ts, contour, knots, k=degree)
    expected = lsq(ts)
    got = np.asarray(regularize_bsplines(contour[None]))[0]
    # lam=1e-6 ridge vs exact LSQ: near-identical
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_gru_sequence_pallas_parity():
    """Fused Pallas GRU recurrence == GRULayer scan, incl. masking."""
    import jax
    from artspeech_tpu.ops.gru import GRULayer
    from artspeech_tpu.ops.pallas_kernels import gru_sequence_pallas

    B, T, E, H = 5, 11, 7, 16
    rng = np.random.default_rng(0)
    layer = GRULayer(hidden_size=H)
    x = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([11, 8, 3, 1, 11])[:, None])
    params = layer.init(jax.random.PRNGKey(0), x, mask)["params"]
    ref = layer.apply({"params": params}, x, mask)
    x_proj = x @ params["wi"] + params["bi"]
    got = gru_sequence_pallas(x_proj, params["wh"], params["bh"], mask, batch_tile=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
