"""Vocal-tract variables (TVs) from articulator contours, fully batched.

Equivalent of reference tract_variables.py:13-125, redesigned TPU-first: the
reference computes each TV with per-frame ``torch.cdist`` + ``.item()`` host
syncs; here every TV for every frame of every sentence is computed in one
fused device computation over (..., N, 2) contour stacks, so the synthesis
pipeline never leaves the device.
"""

from typing import Dict, Optional

import jax.numpy as jnp

from artspeech_tpu.core.constants import (
    LOWER_LIP,
    PHARYNX,
    SOFT_PALATE_MIDLINE,
    TONGUE,
    UPPER_INCISOR,
    UPPER_LIP,
)
from artspeech_tpu.ops.distances import min_distance

#: Sub-contour index windows (reference tract_variables.py:13-20).
ART_SLICES = {
    "tongue-tip": (30, 45),
    "tongue-body": (10, 30),
    "upper-incisor": (25, 50),
    "hard-palate": (0, 25),
    "soft-palate": (35, 50),
    "velum": (0, 15),
}


def _min_pair(arr1, arr2):
    """Min distance between point sets with the argmin points.

    Args:
        arr1: (..., N, 2); arr2: (..., M, 2).
    Returns:
        value (...,), poc_1 (..., 2), poc_2 (..., 2) — the two places of
        constriction. Batched version of reference tract_variables.py:23-35.
    """
    value, i1, i2 = min_distance(arr1, arr2)
    poc_1 = jnp.take_along_axis(arr1, i1[..., None, None], axis=-2)[..., 0, :]
    poc_2 = jnp.take_along_axis(arr2, i2[..., None, None], axis=-2)[..., 0, :]
    return value, poc_1, poc_2


def compute_tract_variables(
    contours: Dict[str, jnp.ndarray],
) -> Dict[str, Optional[dict]]:
    """Compute LA, TTCD, TBCD and VEL for a (batch of) frame(s).

    Args:
        contours: articulator name -> (..., 50, 2) arrays. Must contain the
            six articulators in REQUIRED_ARTICULATORS_FOR_TVS.
    Returns:
        TV name -> {"value": (...,), "poc_1": (..., 2), "poc_2": (..., 2)};
        LP/TTCL/TBCL/GLO map to None exactly as in the reference
        (tract_variables.py:97-123, unimplemented there too).
    """
    llip = contours[LOWER_LIP]
    ulip = contours[UPPER_LIP]
    tongue = contours[TONGUE]
    uincisor = contours[UPPER_INCISOR]
    soft_palate = contours[SOFT_PALATE_MIDLINE]
    pharynx = contours[PHARYNX]

    la, la_p1, la_p2 = _min_pair(llip, ulip)

    tt = tongue[..., slice(*ART_SLICES["tongue-tip"]), :]
    teeth = uincisor[..., slice(*ART_SLICES["upper-incisor"]), :]
    ttcd, ttcd_p1, ttcd_p2 = _min_pair(tt, teeth)

    tb = tongue[..., slice(*ART_SLICES["tongue-body"]), :]
    hard_palate = uincisor[..., slice(*ART_SLICES["hard-palate"]), :]
    soft_palate_part = soft_palate[..., slice(*ART_SLICES["soft-palate"]), :]
    palate = jnp.concatenate([hard_palate, soft_palate_part], axis=-2)
    tbcd, tbcd_p1, tbcd_p2 = _min_pair(tb, palate)

    velum = soft_palate[..., slice(*ART_SLICES["velum"]), :]
    vel, vel_p1, vel_p2 = _min_pair(velum, pharynx)

    return {
        "LA": {"value": la, "poc_1": la_p1, "poc_2": la_p2},
        "LP": None,
        "TTCD": {"value": ttcd, "poc_1": ttcd_p1, "poc_2": ttcd_p2},
        "TTCL": None,
        "TBCD": {"value": tbcd, "poc_1": tbcd_p1, "poc_2": tbcd_p2},
        "TBCL": None,
        "VEL": {"value": vel, "poc_1": vel_p1, "poc_2": vel_p2},
        "GLO": None,
    }


def tract_variables_from_stack(stack, articulators):
    """Compute TVs from a stacked contour tensor.

    Args:
        stack: (..., Nart, 2, 50) model-output layout.
        articulators: names matching the Nart axis (sorted order).
    Returns:
        same structure as :func:`compute_tract_variables`.
    """
    index = {name: i for i, name in enumerate(articulators)}
    contours = {
        name: jnp.swapaxes(stack[..., index[name], :, :], -1, -2)
        for name in index
    }
    return compute_tract_variables(contours)
