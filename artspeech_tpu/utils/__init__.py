from artspeech_tpu.utils.io import (
    make_indices_dict,
    npy_to_xarticul,
    sequences_from_dict,
    xarticul_to_npy,
)
from artspeech_tpu.utils.masks import make_padding_mask
from artspeech_tpu.utils.profiling import StepTimer, annotate, log_compile_time, trace
from artspeech_tpu.utils.tracking import LocalTracker, make_tracker
from artspeech_tpu.utils.torch_import import (
    convert_deepspeech2_state_dict,
    load_librispeech_deepspeech2,
    load_torch_state_dict,
)
