"""Experiment CLI entry points (python -m artspeech_tpu.cli.<name> --config cfg.yaml)."""
