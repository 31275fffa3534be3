from artspeech_tpu.core import constants
from artspeech_tpu.core.config import (
    DATASET_CONFIG,
    DatasetConfig,
    mm_per_unit,
)
from artspeech_tpu.core.vocab import build_vocabulary, load_vocabulary, numericalize
from artspeech_tpu.core.vocab import token_id
