"""regularize_Bsplines adapter over artspeech_tpu.ops.bspline.

Reference call shape: resX, resY = regularize_Bsplines(contour (N, 2),
degree) (phoneme_to_articulation/__init__.py:186-187).
"""

import numpy as np

from artspeech_tpu.ops.bspline import regularize_bsplines


def regularize_Bsplines(contour, degree: int = 3):
    smoothed = np.asarray(regularize_bsplines(np.asarray(contour), degree=degree))
    return smoothed[:, 0], smoothed[:, 1]
