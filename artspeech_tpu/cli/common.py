"""Shared CLI scaffolding: --config YAML + tracker flags.

Mirrors the reference entry-script surface (argparse with --config /
--mlflow / --experiment / --run_id / --run_name / --checkpoint, e.g.
train_phoneme_to_articulation.py:387-424) so thesis_config YAMLs drive
experiments the same way.
"""

import argparse
import os
import time
from typing import Callable, Dict, Optional

import yaml

from artspeech_tpu.utils.tracking import make_tracker


def enable_compilation_cache(cache_dir: Optional[str] = None):
    """Persistent XLA compilation cache: the first DeepSpeech2-sized conv
    autotune costs minutes on TPU; caching makes it once per machine, not
    once per process."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "artspeech_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def model_kwargs_from_cfg(cfg: Dict, key: str = "model_kwargs") -> Dict:
    """Model constructor kwargs from a config, with compute-dtype handling.

    Two equivalent spellings select the production bf16 profile (see
    benchmarks/BENCH_DETAILS.md "bf16 compute knob" — params stay f32):

        compute_dtype: bfloat16          # top level, trainer-agnostic
        model_kwargs: {dtype: bfloat16}  # per-model

    The top-level key merges into the kwargs without overriding an explicit
    per-model dtype; strings resolve via core.config.resolve_dtype.
    """
    from artspeech_tpu.core.config import resolve_dtype

    kwargs = dict(cfg.get(key) or {})
    if cfg.get("compute_dtype") is not None:
        kwargs.setdefault("dtype", cfg["compute_dtype"])
    if "dtype" in kwargs:
        kwargs["dtype"] = resolve_dtype(kwargs["dtype"])
    return kwargs


def parse_cli(description: str):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", dest="config_filepath", required=True)
    parser.add_argument("--mlflow", dest="mlflow_tracking_uri", default=None)
    parser.add_argument("--experiment", dest="experiment_name", default="artspeech_tpu")
    parser.add_argument("--run_id", dest="run_id", default=None)
    parser.add_argument("--run_name", dest="run_name", default=None)
    parser.add_argument("--checkpoint", dest="checkpoint_filepath", default=None)
    parser.add_argument("--output_dir", dest="output_dir", default="results")
    args = parser.parse_args()

    with open(args.config_filepath) as f:
        cfg = yaml.safe_load(f)
    return args, cfg


def run_experiment(description: str, main_fn: Callable):
    """Parse CLI, build tracker, call ``main_fn(cfg, args, tracker)``."""
    enable_compilation_cache()
    args, cfg = parse_cli(description)
    # Unique default so two runs without --run_name never interleave their
    # metrics.jsonl/params.json.
    default_name = f"run_{time.strftime('%Y%m%d_%H%M%S')}_{os.getpid()}"
    run_dir = os.path.join(args.output_dir, args.run_name or default_name)
    tracker = make_tracker(
        run_dir,
        mlflow_uri=args.mlflow_tracking_uri,
        experiment=args.experiment_name,
        run_id=args.run_id,
        run_name=args.run_name,
    )
    tracker.log_params(cfg)
    try:
        return main_fn(cfg, args, tracker)
    finally:
        tracker.end()
