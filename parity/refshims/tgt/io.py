"""tgt.io.read_textgrid adapter: artspeech_tpu.data.textgrid already
exposes the same object shape the reference uses (get_tier_by_name,
tier.intervals / iteration, interval.start_time/end_time/text)."""

from artspeech_tpu.data.textgrid import read_textgrid  # noqa: F401
