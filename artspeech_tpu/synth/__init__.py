from artspeech_tpu.synth.pipeline import (
    SynthesisDataset,
    make_synthesis_step,
    synthesize_corpus,
)
from artspeech_tpu.synth.reference_contour import CANONICAL_UPPER_INCISOR
from artspeech_tpu.synth.viz import (
    make_vocal_tract_shape_video,
    plot_vocal_tract_shape,
    save_vocal_tract_shapes,
    uint16_to_uint8,
)
