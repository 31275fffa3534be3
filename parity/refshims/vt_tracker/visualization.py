"""uint16_to_uint8 adapter over artspeech_tpu.synth.viz."""

from artspeech_tpu.synth.viz import uint16_to_uint8  # noqa: F401
