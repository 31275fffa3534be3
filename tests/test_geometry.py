"""Tests for tract variables, tube generation and the area function."""

import numpy as np
import pytest
import jax.numpy as jnp

from artspeech_tpu.core.constants import (
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE_MIDLINE,
    TONGUE,
    TUBE_ARTICULATORS,
    UPPER_INCISOR,
    UPPER_LIP,
)
from artspeech_tpu.geometry import (
    area_function,
    compute_tract_variables,
    default_semipolar_grid,
    evenly_spaced_fx,
    generate_vocal_tract_tube,
    generate_vocal_tract_tube_batch,
    intersect_semipolar_grid,
    tract_variables_from_stack,
)


def _line(p0, p1, n=50):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return (np.asarray(p0)[None, :] * (1 - t) + np.asarray(p1)[None, :] * t).astype(
        np.float32
    )


def _fake_contours():
    """Synthetic articulator contours with known TV geometry."""
    return {
        LOWER_LIP: _line((0.0, 0.0), (1.0, 0.0)),
        UPPER_LIP: _line((0.0, 0.5), (1.0, 0.5)),
        TONGUE: _line((0.0, 1.0), (1.0, 1.0)),
        UPPER_INCISOR: _line((0.0, 1.25), (1.0, 1.25)),
        SOFT_PALATE_MIDLINE: _line((0.0, 2.0), (1.0, 2.0)),
        PHARYNX: _line((0.0, 2.4), (1.0, 2.4)),
    }


def test_tract_variables_parallel_lines():
    contours = {k: jnp.array(v) for k, v in _fake_contours().items()}
    tvs = compute_tract_variables(contours)
    assert abs(float(tvs["LA"]["value"]) - 0.5) < 1e-5
    assert abs(float(tvs["TTCD"]["value"]) - 0.25) < 1e-5
    assert abs(float(tvs["VEL"]["value"]) - 0.4) < 1e-5
    # Unimplemented TVs stay None like the reference (tract_variables.py:97-123).
    assert tvs["LP"] is None and tvs["GLO"] is None
    # PoCs lie on the right contours.
    assert abs(float(tvs["LA"]["poc_1"][1]) - 0.0) < 1e-5
    assert abs(float(tvs["LA"]["poc_2"][1]) - 0.5) < 1e-5


def test_tract_variables_batched_stack():
    contours = _fake_contours()
    names = sorted(contours)
    stack1 = np.stack([contours[n].T for n in names])  # (Nart, 2, 50)
    stack = np.stack([stack1, stack1])[None]  # (1, 2, Nart, 2, 50)
    tvs = tract_variables_from_stack(jnp.array(stack), names)
    assert tvs["LA"]["value"].shape == (1, 2)
    np.testing.assert_allclose(np.asarray(tvs["LA"]["value"]), 0.5, atol=1e-5)


def test_generate_vocal_tract_tube_shapes():
    rng = np.random.default_rng(0)
    contours = {
        name: (_line((i * 0.05, 0.0), (i * 0.05 + 0.2, 0.3)) + 0.01 * rng.normal(size=(50, 2))).astype(np.float32)
        for i, name in enumerate(TUBE_ARTICULATORS)
    }
    internal, external = generate_vocal_tract_tube(contours)
    assert internal.shape == (100, 2)
    assert external.shape == (100, 2)
    assert np.isfinite(np.asarray(internal)).all()


def test_generate_vocal_tract_tube_batch():
    rng = np.random.default_rng(1)
    stack = rng.normal(size=(2, 3, 11, 2, 50)).astype(np.float32)
    internal, external = generate_vocal_tract_tube_batch(
        jnp.array(stack), sorted(TUBE_ARTICULATORS)
    )
    assert internal.shape == (2, 3, 100, 2)
    assert external.shape == (2, 3, 100, 2)


def test_area_function_constant_radius():
    # Two parallel walls 0.2 apart -> radius 0.1 everywhere, area pi*r^2.
    x = np.linspace(0.0, 1.0, 100)
    internal = jnp.array(np.stack([x, np.zeros_like(x)], axis=1))
    external = jnp.array(np.stack([x, 0.2 * np.ones_like(x)], axis=1))
    dists, fx = area_function(internal, external)
    np.testing.assert_allclose(np.asarray(fx), np.pi * 0.1**2, rtol=1e-5)
    assert abs(float(dists[-1]) - 1.0) < 1e-5


def test_evenly_spaced_fx():
    x = jnp.array(np.linspace(0.0, 2.0, 40))
    fx = 3.0 * x
    out = np.asarray(evenly_spaced_fx(x, fx, n_samples=10))
    assert out.shape == (2, 10)
    np.testing.assert_allclose(out[1], 3.0 * out[0], rtol=1e-4, atol=1e-5)


def test_intersect_semipolar_grid_hits_walls():
    grid = default_semipolar_grid()
    # Walls: two concentric arcs around the default grid center.
    center = np.array([0.45, 0.45])
    ang = np.linspace(np.deg2rad(30.0), np.deg2rad(-120.0), 100)
    internal = center + 0.1 * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    external = center + 0.3 * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    p_int, p_ext, valid = intersect_semipolar_grid(
        jnp.array(internal), jnp.array(external), jnp.array(grid)
    )
    assert bool(valid.any())
    r_int = np.linalg.norm(np.asarray(p_int)[np.asarray(valid)] - center, axis=1)
    r_ext = np.linalg.norm(np.asarray(p_ext)[np.asarray(valid)] - center, axis=1)
    # Lines that crossed both arcs recover the radii.
    assert (np.abs(r_int - 0.1) < 0.02).mean() > 0.5
    assert (np.abs(r_ext - 0.3) < 0.02).mean() > 0.5


def test_intersect_semipolar_grid_mutual_nearest():
    """Reference pairing rules (area_function.py:176-223): a doubly-crossed
    wall pairs the crossing closest to the other wall's crossing."""
    import jax.numpy as jnp
    from artspeech_tpu.geometry.area_function import intersect_semipolar_grid

    # Grid line along x from (0,0) to (10,0).
    grid = np.zeros((1, 2, 2), np.float32)
    grid[0, 0] = [0.0, 0.0]
    grid[0, 1] = [10.0, 0.0]
    # internal wall zig-zags across y=0 at x=2 and x=6
    internal = np.array([[2.0, -1.0], [2.0, 1.0], [6.0, 1.0], [6.0, -1.0]], np.float32)
    # external wall crosses once at x=7
    external = np.array([[7.0, -1.0], [7.0, 1.0]], np.float32)
    ipts, epts, valid = intersect_semipolar_grid(
        jnp.asarray(internal), jnp.asarray(external), jnp.asarray(grid)
    )
    assert bool(valid[0])
    assert float(ipts[0, 0]) == pytest.approx(6.0, abs=1e-5)  # NOT 2.0
    assert float(epts[0, 0]) == pytest.approx(7.0, abs=1e-5)


def test_intersect_semipolar_grid_invalid_lines_masked():
    """Lines touching neither wall are flagged invalid; tube_area_function
    collapses them instead of fabricating sections."""
    import jax.numpy as jnp
    from artspeech_tpu.geometry.area_function import (
        intersect_semipolar_grid,
        tube_area_function,
    )

    grid = np.zeros((3, 2, 2), np.float32)
    grid[0] = [[0, 0], [0, 10]]    # crosses both walls at x=0
    grid[1] = [[5, 0], [5, 10]]    # crosses both walls at x=5
    grid[2] = [[50, 0], [50, 10]]  # far away: crosses nothing
    internal = np.array([[-1.0, 2.0], [6.0, 2.0]], np.float32)
    external = np.array([[-1.0, 8.0], [6.0, 8.0]], np.float32)
    ipts, epts, valid = intersect_semipolar_grid(
        jnp.asarray(internal), jnp.asarray(external), jnp.asarray(grid)
    )
    assert valid.tolist() == [True, True, False]

    af = np.asarray(
        tube_area_function(
            jnp.asarray(internal), jnp.asarray(external), semipolar_grid=grid,
            n_samples=16,
        )
    )
    # invalid line collapsed onto the last valid one: midline spans x=0..5
    assert af.shape == (2, 16)
    assert af[0, -1] == pytest.approx(5.0, abs=1e-4)
    # every section radius = 3 -> area pi*9
    np.testing.assert_allclose(af[1], np.pi * 9.0, rtol=1e-5)


def test_tube_area_function_head_invalid_lines():
    """Leading invalid grid lines collapse onto the FIRST valid line (the
    reference skips them, area_function.py:185-186). A wrong backfill onto
    the LAST valid line would insert a phantom midline step from x=5 back
    to x=0, doubling the tube length."""
    import jax.numpy as jnp
    from artspeech_tpu.geometry.area_function import (
        intersect_semipolar_grid,
        tube_area_function,
    )

    grid = np.zeros((4, 2, 2), np.float32)
    grid[0] = [[50, 0], [50, 10]]  # far away: crosses nothing (head)
    grid[1] = [[60, 0], [60, 10]]  # far away: crosses nothing (head)
    grid[2] = [[0, 0], [0, 10]]    # crosses both walls at x=0
    grid[3] = [[5, 0], [5, 10]]    # crosses both walls at x=5
    internal = np.array([[-1.0, 2.0], [6.0, 2.0]], np.float32)
    external = np.array([[-1.0, 8.0], [6.0, 8.0]], np.float32)
    ipts, epts, valid = intersect_semipolar_grid(
        jnp.asarray(internal), jnp.asarray(external), jnp.asarray(grid)
    )
    assert valid.tolist() == [False, False, True, True]

    af = np.asarray(
        tube_area_function(
            jnp.asarray(internal), jnp.asarray(external), semipolar_grid=grid,
            n_samples=16,
        )
    )
    # Head lines duplicate the first valid section: midline spans x=0..5
    # only (length 5, NOT 10), every section radius 3 -> area pi*9.
    assert af[0, -1] == pytest.approx(5.0, abs=1e-4)
    np.testing.assert_allclose(af[1], np.pi * 9.0, rtol=1e-5)


def test_intersect_one_wall_endpoint_fallback():
    """Only one wall crossed: the other wall contributes its nearest
    endpoint (reference :200-221)."""
    import jax.numpy as jnp
    from artspeech_tpu.geometry.area_function import intersect_semipolar_grid

    grid = np.zeros((1, 2, 2), np.float32)
    grid[0] = [[5, 0], [5, 10]]
    internal = np.array([[0.0, 2.0], [10.0, 2.0]], np.float32)  # crossed at (5,2)
    external = np.array([[20.0, 8.0], [30.0, 8.0]], np.float32)  # never crossed
    ipts, epts, valid = intersect_semipolar_grid(
        jnp.asarray(internal), jnp.asarray(external), jnp.asarray(grid)
    )
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(ipts[0]), [5.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(epts[0]), [20.0, 8.0], atol=1e-5)  # nearest endpoint


def _brute_intersect(internal, external, grid):
    """Scalar numpy reference for intersect_semipolar_grid (float64).

    Mirrors the documented semantics — mutual-nearest crossing pair when
    both walls are crossed, nearest-endpoint fallback when only one is —
    with plain loops and fancy indexing, guarding the vectorized one-hot
    compaction/selection machinery in area_function.py.
    """
    L = grid.shape[0]
    int_pts = np.zeros((L, 2))
    ext_pts = np.zeros((L, 2))
    valid = np.zeros(L, bool)
    for l in range(L):
        p0, p1 = grid[l, 0].astype(float), grid[l, -1].astype(float)
        d = p1 - p0

        def crossings(wall):
            ts = []
            for s in range(len(wall) - 1):
                q0 = wall[s].astype(float)
                e = wall[s + 1].astype(float) - q0
                denom = d[0] * e[1] - d[1] * e[0]
                if abs(denom) <= 1e-12:
                    continue
                rel = q0 - p0
                t = (rel[0] * e[1] - rel[1] * e[0]) / denom
                u = (rel[0] * d[1] - rel[1] * d[0]) / denom
                if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                    ts.append(t)
            return ts

        ti, te = crossings(internal), crossings(external)
        if ti and te:
            pairs = [(abs(a - b), a, b) for a in ti for b in te]
            _, a, b = min(pairs)
            int_pts[l] = p0 + a * d
            ext_pts[l] = p0 + b * d
            valid[l] = True
        elif ti or te:
            ts, other = (ti, external) if ti else (te, internal)
            endpoints = [other[0].astype(float), other[-1].astype(float)]
            best = min(
                (np.sum((p0 + t * d - ep) ** 2), t, tuple(ep))
                for t in ts
                for ep in endpoints
            )
            d_end = [min(np.sum((p0 + t * d - ep) ** 2) for t in ts) for ep in endpoints]
            own = p0 + best[1] * d
            other_pt = endpoints[1] if d_end[1] < d_end[0] else endpoints[0]
            if ti:
                int_pts[l], ext_pts[l] = own, other_pt
            else:
                int_pts[l], ext_pts[l] = other_pt, own
            valid[l] = True
        else:
            int_pts[l] = ext_pts[l] = p0
    return int_pts, ext_pts, valid


def test_intersect_semipolar_grid_brute_force_golden():
    """Random wavy walls vs the scalar reference: all three regimes."""
    rng = np.random.default_rng(3)
    theta = np.linspace(0.1, np.pi - 0.1, 40)
    internal = np.stack(
        [0.8 * np.cos(theta), 0.8 * np.sin(theta)], axis=-1
    ) + rng.normal(0, 0.02, (40, 2))
    # External wall covers only the first 60% of the angular range so the
    # remaining grid lines exercise the one-wall and invalid paths.
    te_ = np.linspace(0.1, 0.6 * np.pi, 30)
    external = np.stack(
        [1.2 * np.cos(te_), 1.2 * np.sin(te_)], axis=-1
    ) + rng.normal(0, 0.02, (30, 2))
    ang = np.linspace(0.15, np.pi - 0.15, 24)
    grid = np.stack(
        [
            np.stack([0.5 * np.cos(ang), 0.5 * np.sin(ang)], axis=-1),
            np.stack([1.5 * np.cos(ang), 1.5 * np.sin(ang)], axis=-1),
        ],
        axis=1,
    ).astype(np.float32)  # (L, 2, 2)
    # A few lines entirely outside both walls exercise the invalid path.
    far = np.stack(
        [
            np.stack([1.35 * np.cos(ang[:4]), 1.35 * np.sin(ang[:4])], axis=-1),
            np.stack([1.5 * np.cos(ang[:4]), 1.5 * np.sin(ang[:4])], axis=-1),
        ],
        axis=1,
    ).astype(np.float32)
    grid = np.concatenate([grid, far], axis=0)

    ref_i, ref_e, ref_v = _brute_intersect(
        internal.astype(np.float32), external.astype(np.float32), grid
    )
    got_i, got_e, got_v = intersect_semipolar_grid(
        jnp.asarray(internal, jnp.float32),
        jnp.asarray(external, jnp.float32),
        jnp.asarray(grid),
    )
    # All regimes must actually occur in this fixture.
    assert ref_v.sum() > 0 and (~ref_v).sum() > 0
    np.testing.assert_array_equal(np.asarray(got_v), ref_v)
    np.testing.assert_allclose(np.asarray(got_i), ref_i, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), ref_e, atol=2e-4)
