"""load_articulator_array adapter over artspeech_tpu.data.loaders."""

from artspeech_tpu.data.loaders import load_articulator_array  # noqa: F401
