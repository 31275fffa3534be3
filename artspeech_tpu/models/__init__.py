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
from artspeech_tpu.models.autoencoder import (
    Decoder,
    Encoder,
    MultiArticulatorAutoencoder,
    MultiDecoder,
    MultiEncoder,
    PCADecoder,
    PCAEncoder,
    latent_size_of,
    normalize_indices_dict,
)
from artspeech_tpu.models.latent_rnn import (
    PrincipalComponentsArtSpeech,
    PrincipalComponentsPredictor,
    make_latent_rnn_synthesis_forward,
)
from artspeech_tpu.models.transformer import (
    ArtSpeechTransformer,
    ChannelInteractionsLayer,
    ChannelProcessingLayer,
    MultiChannelDecoderLayer,
    PositionalEncoding,
)
from artspeech_tpu.models.transformer import make_auto_generate, make_fast_generate
