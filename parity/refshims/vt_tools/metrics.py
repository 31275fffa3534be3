"""numpy contour metrics with the vt_tools call signatures used by the
reference (metrics.py:4, area_function.py:9)."""

import numpy as np


def distance_matrix(u, v):
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    return np.linalg.norm(u[:, None, :] - v[None, :, :], axis=-1)


def euclidean(p1, p2):
    return float(np.linalg.norm(np.asarray(p1, np.float64) - np.asarray(p2, np.float64)))


def p2cp_mean(u, v):
    d = distance_matrix(u, v)
    return float((d.min(axis=1).mean() + d.min(axis=0).mean()) / 2.0)
