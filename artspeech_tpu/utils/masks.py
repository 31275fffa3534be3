"""Padding-mask utilities (reference helpers.py:79-91)."""

import jax.numpy as jnp


def make_padding_mask(lengths, max_length: int):
    """Boolean mask (B, max_length); True where t < length.

    Unlike the reference (which sizes the mask by ``lengths.max()``), the
    maximum length is a static argument so the result has a fixed shape
    under jit.
    """
    lengths = jnp.asarray(lengths)
    positions = jnp.arange(max_length)[None, :]
    return positions < lengths[:, None]
