from artspeech_tpu.models.artspeech_rnn import ArtSpeech, SimpleArtSpeech
from artspeech_tpu.models.heads import ArticulatorPredictor, ContourDecoder
from artspeech_tpu.models.mean_contour import (
    MeanContourTable,
    fit_mean_contour,
    make_mean_contour_forward,
    relative_positions,
)
from artspeech_tpu.models.deepspeech2 import (
    Adapter,
    DeepSpeech2,
    get_noise_logits,
    get_normalized_outputs,
)
