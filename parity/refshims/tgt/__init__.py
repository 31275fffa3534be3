"""tgt stand-in over artspeech_tpu's TextGrid parser."""
from tgt.io import read_textgrid  # noqa: F401
