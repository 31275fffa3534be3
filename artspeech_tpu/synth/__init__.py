from artspeech_tpu.synth.pipeline import (
    SynthesisDataset,
    make_synthesis_step,
    synthesize_corpus,
)
from artspeech_tpu.synth.reference_contour import CANONICAL_UPPER_INCISOR
