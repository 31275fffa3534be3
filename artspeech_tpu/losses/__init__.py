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
