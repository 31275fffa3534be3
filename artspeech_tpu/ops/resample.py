"""Contour / signal resampling primitives.

Host-side numpy versions serve the data layer (tail clipping, reference
phoneme_to_articulation/tail_clipper.py uses ``F.interpolate(size=50)``, whose
torch default mode is nearest-neighbour in index space); jnp versions serve
on-device geometry (arc-length resampling of tube walls, replacing the shapely
``evenly_spaced_fx`` at reference area_function.py:145-159).
"""

import numpy as np
import jax.numpy as jnp


def resample_nearest_np(points: np.ndarray, n_out: int) -> np.ndarray:
    """Nearest-neighbour index-space resample of (N, C) -> (n_out, C).

    Matches ``torch.nn.functional.interpolate(mode="nearest")`` semantics:
    ``src = floor(dst * N / n_out)``.
    """
    n_in = points.shape[0]
    idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int64)
    idx = np.clip(idx, 0, n_in - 1)
    return points[idx]


def resample_linear_np(points: np.ndarray, n_out: int) -> np.ndarray:
    """Linear index-space resample of (N, C) -> (n_out, C) (align_corners=True)."""
    n_in = points.shape[0]
    if n_in == 1:
        return np.repeat(points, n_out, axis=0)
    src = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo)[:, None]
    return points[lo] * (1.0 - w) + points[hi] * w


def interp1d(x_new, x, y):
    """Piecewise-linear interpolation, batched over leading dims of y.

    Args:
        x_new: (K,) query points (monotone x assumed).
        x: (N,) sample locations, strictly increasing.
        y: (..., N) sample values.
    Returns:
        (..., K) interpolated values (clamped at the ends).

    TPU note: implemented as a (K, N) comparison reduce + one-hot einsum
    instead of ``searchsorted`` + gathers — under vmap over thousands of
    frames the sorted-search/gather lowering dominated the whole synthesis
    pipeline, while this form is a couple of tiny matmuls.
    """
    n = x.shape[0]
    # searchsorted(x, x_new, side="right") - 1 == count(x <= x_new) - 1
    idx = jnp.clip(
        jnp.sum(x_new[:, None] >= x[None, :], axis=1) - 1, 0, n - 2
    )
    oh0 = (idx[:, None] == jnp.arange(n)).astype(y.dtype)  # (K, N)
    oh1 = (idx[:, None] + 1 == jnp.arange(n)).astype(y.dtype)
    # precision=highest: the selected sample values must come through exact
    # (the TPU default computes f32 dots as one bf16 MXU pass, which would
    # quantize x0/x1 — and thus the interpolation weights — to ~2^-8 rel).
    x0 = jnp.matmul(oh0, x, precision="highest")
    x1 = jnp.matmul(oh1, x, precision="highest")
    w = jnp.where(x1 > x0, (x_new - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0)
    y0 = jnp.einsum("...n,kn->...k", y, oh0, precision="highest")
    y1 = jnp.einsum("...n,kn->...k", y, oh1, precision="highest")
    return y0 * (1.0 - w) + y1 * w


def arclength_resample(points, n_out: int):
    """Resample a polyline to n_out points evenly spaced in arc length.

    Args:
        points: (N, 2) polyline vertices.
    Returns:
        (n_out, 2). Vectorized replacement for the shapely LineString
        intersection loop in reference area_function.py:145-159 — instead of
        intersecting vertical lines with the curve, we interpolate x and y as
        functions of cumulative arc length, which is identical for simple
        (non-self-intersecting in the sweep direction) curves and runs fully
        on-device.
    """
    seg = points[1:] - points[:-1]
    seglen = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 0.0))
    s = jnp.concatenate([jnp.zeros((1,), points.dtype), jnp.cumsum(seglen)])
    # Duplicate vertices give zero-width segments in s; interp1d's
    # x1 > x0 guard handles them (a sub-eps additive nudge would be a no-op
    # in float32).
    s_new = jnp.linspace(s[0], s[-1], n_out)
    xs = interp1d(s_new, s, points[:, 0])
    ys = interp1d(s_new, s, points[:, 1])
    return jnp.stack([xs, ys], axis=-1)
