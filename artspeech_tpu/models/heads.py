"""Per-articulator contour prediction heads.

Equivalent of reference encoder_decoder/models.py:7-50 (``ArticulatorPredictor``
and ``Decoder``), redesigned TPU-first: instead of a Python ``ModuleList`` loop
over articulators, the predictor is ``nn.vmap``-lifted over an articulator
axis, so all heads execute as one batched einsum with parameters stacked on a
leading (Nart, ...) axis — which is also the natural tensor-parallel sharding
axis (see artspeech_tpu.parallel).
"""

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class ArticulatorPredictor(nn.Module):
    """LayerNorm/Linear MLP with separate x/y coordinate heads.

    (B, T, F) -> (B, T, 2, n_samples). Mirrors reference
    encoder_decoder/models.py:7-33.
    """

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


def make_articulator_heads(n_articulators: int, **kwargs):
    """All articulator heads as a single vmapped module.

    Input (B, T, F) (shared across heads), output (B, T, Nart, 2, n_samples).
    Parameters carry a leading articulator axis.
    """
    vmapped = nn.vmap(
        ArticulatorPredictor,
        in_axes=None,
        out_axes=2,
        axis_size=n_articulators,
        variable_axes={"params": 0},
        split_rngs={"params": True},
    )
    return vmapped(**kwargs)


class ContourDecoder(nn.Module):
    """Stacked heads + sigmoid (reference encoder_decoder/models.py:36-50)."""

    n_articulators: int
    n_samples: int = 50
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        heads = make_articulator_heads(
            self.n_articulators, n_samples=self.n_samples, dtype=self.dtype
        )
        return nn.sigmoid(heads(x))
