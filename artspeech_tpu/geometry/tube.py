"""Vocal-tract tube (air column) wall generation.

Rebuilds the behavior of ``vt_shape_gen.vocal_tract_tube.generate_vocal_tract_tube``
(not vendored in the reference; call sites: reference
scripts/shape_to_air_column.py:77-81, generate_vocal_tract_shape_v2.py:425-439).
Contract reconstructed from the call sites: the 11 tube articulator contours
(each (50, 2), normalized coordinates) map to an internal and an external
air-column wall of (100, 2) points each, stored as a (2, 2, 100) array after
transposition.

Design: the tube is bounded below/anteriorly by the "internal" chain
(vocal folds -> thyroid cartilage -> epiglottis -> tongue -> lower incisor ->
lower lip) and above/posteriorly by the "external" chain (arytenoid cartilage
-> pharynx -> soft palate -> upper incisor -> upper lip). Each articulator
contour is flipped, if needed, so the chain flows continuously from glottis to
lips (endpoint matching), the chains are concatenated, and arc-length
resampled to 100 points. Everything is jit-compatible and batches over frames
with ``vmap`` — the reference version is a per-frame host call.
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from artspeech_tpu.core.constants import (
    ARYTENOID_CARTILAGE,
    EPIGLOTTIS,
    LOWER_INCISOR,
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE_MIDLINE,
    THYROID_CARTILAGE,
    TONGUE,
    UPPER_INCISOR,
    UPPER_LIP,
    VOCAL_FOLDS,
)
from artspeech_tpu.ops.resample import arclength_resample

INTERNAL_WALL_ORDER: List[str] = [
    VOCAL_FOLDS,
    THYROID_CARTILAGE,
    EPIGLOTTIS,
    TONGUE,
    LOWER_INCISOR,
    LOWER_LIP,
]

EXTERNAL_WALL_ORDER: List[str] = [
    ARYTENOID_CARTILAGE,
    PHARYNX,
    SOFT_PALATE_MIDLINE,
    UPPER_INCISOR,
    UPPER_LIP,
]


def _chain(contours: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate contours into one polyline, flipping segments for continuity.

    The first contour is oriented so its far end is closest to the next
    contour; subsequent contours are oriented to continue from the running
    endpoint. All decisions are `jnp.where` selects, so the function jits.
    """
    def dist(a, b):
        return jnp.sum((a - b) ** 2)

    first = contours[0]
    if len(contours) > 1:
        nxt = contours[1]
        approach = jnp.minimum(dist(nxt[0], first[-1]), dist(nxt[-1], first[-1]))
        approach_flipped = jnp.minimum(dist(nxt[0], first[0]), dist(nxt[-1], first[0]))
        first = jnp.where(approach_flipped < approach, first[::-1], first)

    pieces = [first]
    end = first[-1]
    for contour in contours[1:]:
        flip = dist(contour[-1], end) < dist(contour[0], end)
        oriented = jnp.where(flip, contour[::-1], contour)
        pieces.append(oriented)
        end = oriented[-1]
    return jnp.concatenate(pieces, axis=0)


def generate_vocal_tract_tube(
    articulators_dict: Dict[str, jnp.ndarray],
    wall_points: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the internal and external air-column walls for one frame.

    Args:
        articulators_dict: articulator name -> (50, 2) contour in normalized
            coordinates (already divided by RES, as in the reference call
            sites which pass ``norm_value=dataset_config.RES``).
        wall_points: output points per wall (reference stores 100).
    Returns:
        (internal_wall, external_wall), each (wall_points, 2).
    """
    internal = _chain([jnp.asarray(articulators_dict[a]) for a in INTERNAL_WALL_ORDER])
    external = _chain([jnp.asarray(articulators_dict[a]) for a in EXTERNAL_WALL_ORDER])
    return (
        arclength_resample(internal, wall_points),
        arclength_resample(external, wall_points),
    )


def generate_vocal_tract_tube_batch(stack, articulators, wall_points: int = 100):
    """Vectorized tube generation over a batch of frames.

    Args:
        stack: (..., Nart, 2, 50) contour stacks in model-output layout.
        articulators: names matching the Nart axis.
    Returns:
        (internal, external): each (..., wall_points, 2).
    """
    index = {name: i for i, name in enumerate(articulators)}

    def one_frame(frame):
        contours = {
            name: frame[index[name]].T for name in index  # (50, 2)
        }
        return generate_vocal_tract_tube(contours, wall_points)

    batch_shape = stack.shape[:-3]
    flat = stack.reshape((-1,) + stack.shape[-3:])
    internal, external = jax.vmap(one_frame)(flat)
    return (
        internal.reshape(batch_shape + internal.shape[1:]),
        external.reshape(batch_shape + external.shape[1:]),
    )
