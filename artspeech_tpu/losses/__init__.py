from artspeech_tpu.losses.articulation import (
    euclidean_distance_mm,
    masked_euclidean_loss,
    p2cp_distance_mm,
    recognition_feature_loss,
)
from artspeech_tpu.losses.recognition import (
    cross_entropy_loss,
    ctc_loss,
    load_class_weights,
)
from artspeech_tpu.losses.autoencoder import (
    critical_loss,
    decoder_mean_p2cp_mm,
    make_autoencoder_loss,
    offdiag_cov_penalty,
    regularized_latents_mse_loss,
)
