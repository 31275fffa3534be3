"""generate_vocal_tract_tube adapter over artspeech_tpu.geometry.tube.

Reference call shapes (scripts/shape_to_air_column.py:77-81,
generate_vocal_tract_shape_v2.py:426-427): dict of articulator -> (50, 2)
contours (optionally un-normalized with norm_value) -> (internal, external)
walls, each (100, 2) numpy.
"""

import numpy as np

from artspeech_tpu.geometry.tube import generate_vocal_tract_tube as _tube


def generate_vocal_tract_tube(articulators_dict, norm_value=None):
    arrs = {}
    for name, contour in articulators_dict.items():
        arr = np.asarray(contour, dtype=np.float32)
        if arr.shape[0] == 2 and arr.shape[1] != 2:
            arr = arr.T
        if norm_value is not None:
            arr = arr / float(norm_value)
        arrs[name] = arr
    internal, external = _tube(arrs)
    return np.asarray(internal), np.asarray(external)
