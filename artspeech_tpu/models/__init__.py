from artspeech_tpu.models.artspeech_rnn import ArtSpeech, SimpleArtSpeech
from artspeech_tpu.models.heads import ArticulatorPredictor, ContourDecoder
