"""PCA fitting via SVD.

Replaces the reference's sklearn ``IncrementalPCA.partial_fit`` loop
(train_articulatory_PCA.py:38-202) with one (X)LA SVD per articulator —
the corpora are small enough (tens of thousands of 100-dim frames) that a
full economy SVD on device is both simpler and exact.
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def fit_pca(x: np.ndarray, num_components: int) -> Dict[str, np.ndarray]:
    """Fit PCA on (N, F) data.

    Returns {"mean": (F,), "eigenvectors": (k, F), "eigenvalues": (k,)}
    matching the PCAEncoder/PCADecoder parameter schema
    (artspeech_tpu.models.autoencoder). Eigenvalues are the explained
    variances (sklearn convention).
    """
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x, axis=0)
    centered = x - mean
    _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    n = x.shape[0]
    eigenvalues = (s**2) / max(n - 1, 1)
    return {
        "mean": np.asarray(mean),
        "eigenvectors": np.asarray(vt[:num_components]),
        "eigenvalues": np.asarray(eigenvalues[:num_components]),
    }


def explained_variance_ratio(eigenvalues: np.ndarray, total_var: float) -> np.ndarray:
    return np.asarray(eigenvalues) / max(total_var, 1e-12)
