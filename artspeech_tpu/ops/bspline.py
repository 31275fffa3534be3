"""B-spline contour regularization as a fixed linear projection.

Replaces ``vt_tools.bs_regularization.regularize_Bsplines`` (used at reference
phoneme_to_articulation/__init__.py:31,186). The reference smooths a 50-point
contour with a degree-3 B-spline fit. Because both the sample count and the
spline configuration are fixed, the entire fit-and-evaluate round trip is a
*constant* N x N linear operator: ``smoothed = P @ points`` with

    P = B (B^T B + lam * I)^-1 B^T

where B is the (N, K) clamped uniform B-spline design matrix. On TPU this is a
single tiny matmul that batches over (B*T*Nart) contours on the MXU, instead of
a per-contour scipy call on the host.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def bspline_basis(n_points: int, n_ctrl: int, degree: int = 3) -> np.ndarray:
    """Clamped uniform B-spline design matrix of shape (n_points, n_ctrl).

    Evaluated at uniformly spaced parameters in [0, 1] via Cox-de Boor.
    """
    if n_ctrl <= degree:
        raise ValueError("n_ctrl must exceed degree")
    # Clamped uniform knot vector.
    n_knots = n_ctrl + degree + 1
    interior = n_knots - 2 * (degree + 1)
    knots = np.concatenate(
        [
            np.zeros(degree + 1),
            np.linspace(0.0, 1.0, interior + 2)[1:-1],
            np.ones(degree + 1),
        ]
    )
    ts = np.linspace(0.0, 1.0, n_points)
    # Cox-de Boor recursion, degree 0 base case.
    basis = np.zeros((len(ts), len(knots) - 1))
    for i in range(len(knots) - 1):
        basis[:, i] = (ts >= knots[i]) & (ts < knots[i + 1])
    # Make the last parameter value fall in the final span.
    basis[-1, :] = 0.0
    last_span = np.max(np.nonzero(knots < 1.0)[0])
    basis[-1, last_span] = 1.0
    for d in range(1, degree + 1):
        next_basis = np.zeros((len(ts), len(knots) - 1 - d))
        for i in range(len(knots) - 1 - d):
            left_den = knots[i + d] - knots[i]
            right_den = knots[i + d + 1] - knots[i + 1]
            left = 0.0
            if left_den > 0:
                left = (ts - knots[i]) / left_den * basis[:, i]
            right = 0.0
            if right_den > 0:
                right = (knots[i + d + 1] - ts) / right_den * basis[:, i + 1]
            next_basis[:, i] = left + right
        basis = next_basis
    return basis[:, :n_ctrl]


@lru_cache(maxsize=None)
def bspline_projection(
    n_points: int = 50, n_ctrl: int = 12, degree: int = 3, lam: float = 1e-6
) -> np.ndarray:
    """Precomputed (n_points, n_points) smoothing projection matrix."""
    basis = bspline_basis(n_points, n_ctrl, degree)
    gram = basis.T @ basis + lam * np.eye(n_ctrl)
    proj = basis @ np.linalg.solve(gram, basis.T)
    return proj.astype(np.float32)


def regularize_bsplines(contours, degree: int = 3, n_ctrl: int = 12):
    """Smooth contours with a least-squares B-spline fit.

    Args:
        contours: (..., N, 2) contour points.
        degree: spline degree (reference always passes 3).
        n_ctrl: number of control points; fewer = smoother.
    Returns:
        (..., N, 2) smoothed contours. Drop-in equivalent of
        ``regularize_Bsplines(contour, 3)`` but batched and jittable.
    """
    contours = jnp.asarray(contours)
    n = contours.shape[-2]
    proj = jnp.asarray(bspline_projection(n, n_ctrl, degree))
    return jnp.einsum("ij,...jc->...ic", proj, contours)
