from artspeech_tpu.ops.bspline import bspline_projection, regularize_bsplines
from artspeech_tpu.ops.distances import (
    euclidean_distance,
    mean_p2cp,
    mean_p2cp_channel_major,
    min_distance,
    pairwise_distances,
    pearson_correlation,
)
from artspeech_tpu.ops.resample import (
    arclength_resample,
    interp1d,
    resample_linear_np,
    resample_nearest_np,
)
from artspeech_tpu.ops.melspec import (
    dynamic_range_compression,
    mel_filterbank,
    melspectrogram,
)
from artspeech_tpu.ops.pca import explained_variance_ratio, fit_pca
