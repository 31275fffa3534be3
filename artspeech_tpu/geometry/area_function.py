"""Area function computation from air-column walls, fully vectorized.

Equivalent of reference area_function.py:113-223, redesigned for XLA:
- the numba ``mid_point`` kernel (reference :113-121) becomes a fused
  elementwise expression;
- the shapely grid-line/wall intersection loop (:175-223) becomes a batched
  segment-segment intersection solve over (n_lines, n_wall_segments);
- the shapely ``evenly_spaced_fx`` resampling (:145-159) becomes monotone
  linear interpolation on device.

Everything is static-shape and jit/vmap friendly so the whole
contour -> tube -> area-function synthesis path runs as one compiled program.
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from artspeech_tpu.ops.resample import interp1d


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def intersect_lines_with_wall(line_p0, line_p1, wall):
    """Intersect straight grid lines with a wall polyline.

    Args:
        line_p0: (L, 2) grid-line internal endpoints.
        line_p1: (L, 2) grid-line external endpoints.
        wall: (W, 2) wall polyline.
    Returns:
        points: (L, 2) intersection point per line. If a line does not cross
            the wall, the closest wall vertex to the line segment is returned
            (the reference falls back to wall endpoints in that case,
            area_function.py:200-221).
        hit: (L,) bool, True where a true intersection exists.
        t: (L,) parameter along the grid line of the returned point.
    """
    q0 = wall[:-1]  # (S, 2)
    e = wall[1:] - wall[:-1]  # (S, 2)
    d = (line_p1 - line_p0)[:, None, :]  # (L, 1, 2)
    rel = q0[None, :, :] - line_p0[:, None, :]  # (L, S, 2)

    denom = _cross2(d, e[None, :, :])  # (L, S)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    t = _cross2(rel, e[None, :, :]) / safe
    u = _cross2(rel, jnp.broadcast_to(d, rel.shape)) / safe
    valid = (
        (jnp.abs(denom) > 1e-12)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )

    # Pick the valid intersection closest to the internal end (smallest t).
    t_masked = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=1)  # (L,)
    hit = jnp.any(valid, axis=1)
    t_best = jnp.take_along_axis(t_masked, best[:, None], axis=1)[:, 0]
    points_hit = line_p0 + jnp.where(hit, t_best, 0.0)[:, None] * (line_p1 - line_p0)

    # Fallback: closest wall vertex to the grid line segment (clamped projection).
    ap = wall[None, :, :] - line_p0[:, None, :]  # (L, W, 2)
    dd = jnp.sum((line_p1 - line_p0) ** 2, axis=-1)[:, None]  # (L, 1)
    tproj = jnp.clip(
        jnp.sum(ap * (line_p1 - line_p0)[:, None, :], axis=-1)
        / jnp.maximum(dd, 1e-12),
        0.0,
        1.0,
    )  # (L, W)
    foot = line_p0[:, None, :] + tproj[..., None] * (line_p1 - line_p0)[:, None, :]
    dist = jnp.sum((wall[None, :, :] - foot) ** 2, axis=-1)  # (L, W)
    nearest = jnp.argmin(dist, axis=1)
    points_near = wall[nearest]
    t_near = jnp.take_along_axis(tproj, nearest[:, None], axis=1)[:, 0]

    points = jnp.where(hit[:, None], points_hit, points_near)
    t_out = jnp.where(hit, t_best, t_near)
    return points, hit, t_out


def intersect_semipolar_grid(internal_wall, external_wall, semipolar_grid):
    """Intersect both walls with every grid line.

    Args:
        internal_wall: (W, 2); external_wall: (W, 2).
        semipolar_grid: (L, R, 2) grid-line samples (only the endpoints are
            used — the lines are straight).
    Returns:
        internal_pts: (L, 2); external_pts: (L, 2); valid: (L,) bool, True
        where at least one wall truly intersects the line (mirrors the
        reference skipping no-contact lines, area_function.py:185-186).
    """
    p0 = semipolar_grid[:, 0, :]
    p1 = semipolar_grid[:, -1, :]
    internal_pts, hit_int, _ = intersect_lines_with_wall(p0, p1, internal_wall)
    external_pts, hit_ext, _ = intersect_lines_with_wall(p0, p1, external_wall)
    valid = hit_int | hit_ext
    return internal_pts, external_pts, valid


def area_function(
    internal_wall,
    external_wall,
    alpha: float = float(np.pi),
    beta: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Midline distance axis and area values from matched wall points.

    Args:
        internal_wall, external_wall: (L, 2) matched cross-section points.
    Returns:
        dists: (L,) cumulative distance along the tube midline.
        fx: (L,) area values ``alpha * radius ** beta``.
    Equivalent of reference area_function.py:124-142 (midpoint + half
    Euclidean distance per section, cumulative midline arc length).
    """
    mid = (internal_wall + external_wall) / 2.0
    radius = (
        jnp.sqrt(
            jnp.maximum(jnp.sum((internal_wall - external_wall) ** 2, axis=-1), 0.0)
        )
        / 2.0
    )
    fx = alpha * radius**beta
    step = jnp.sqrt(
        jnp.maximum(jnp.sum((mid[1:] - mid[:-1]) ** 2, axis=-1), 0.0)
    )
    dists = jnp.concatenate([jnp.zeros((1,), mid.dtype), jnp.cumsum(step)])
    return dists, fx


def evenly_spaced_fx(x, fx, n_samples: int = 200):
    """Resample (x, fx) onto an evenly spaced x axis.

    Returns a (2, n_samples) array [xs; fx(xs)], matching the reference
    output layout (area_function.py:145-159) but via monotone interpolation
    instead of shapely line intersections.
    """
    x = x + jnp.arange(x.shape[0], dtype=x.dtype) * 1e-9  # enforce monotone
    xs = jnp.linspace(x[0], x[-1], n_samples)
    vals = interp1d(xs, x, fx)
    return jnp.stack([xs, vals], axis=0)


def tube_area_function(
    internal_wall,
    external_wall,
    semipolar_grid=None,
    n_samples: int = 200,
    alpha: float = float(np.pi),
    beta: float = 2.0,
):
    """Full pipeline: walls -> (grid-matched sections) -> evenly spaced area fn.

    If ``semipolar_grid`` is given, wall points are first matched through the
    grid (reference scripts pipeline); otherwise the walls are assumed already
    index-matched (they are, coming out of
    :func:`artspeech_tpu.geometry.tube.generate_vocal_tract_tube`).

    Returns:
        (2, n_samples) evenly spaced (position, area) samples.
    """
    if semipolar_grid is not None:
        internal_wall, external_wall, _ = intersect_semipolar_grid(
            internal_wall, external_wall, jnp.asarray(semipolar_grid)
        )
    dists, fx = area_function(internal_wall, external_wall, alpha=alpha, beta=beta)
    return evenly_spaced_fx(dists, fx, n_samples=n_samples)
