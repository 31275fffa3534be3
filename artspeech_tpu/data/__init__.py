from artspeech_tpu.data.batching import (
    BucketedLoader,
    collate_articulation_batch,
    pad_to,
    pick_bucket,
)
from artspeech_tpu.data.collectors import DATABASE_COLLECTORS, DatabaseCollector
from artspeech_tpu.data.datasets import PHONEMES_PER_TV, ArtSpeechDataset, critical_mask
from artspeech_tpu.data.loaders import (
    VocalTractShapeLoader,
    cached_load_articulator_array,
    load_articulator_array,
    prepare_articulator_array,
)
from artspeech_tpu.data.tail_clipper import TailClipper
from artspeech_tpu.data.textgrid import TextGrid, read_textgrid, write_textgrid
from artspeech_tpu.data.transforms import Normalize, load_articulator_norm_stats
from artspeech_tpu.data.recognition import (
    PhonemeRecognitionDataset,
    RecognitionLoader,
    SyntheticPhonemeRecognitionDataset,
)
from artspeech_tpu.data.pc_datasets import (
    AutoencoderDataset,
    PrincipalComponentsDataset,
    compute_normalization_statistics,
    load_norm_stats,
    stack_norm_stats,
)
from artspeech_tpu.data.batching import CachedLoader, prefetch_to_device
