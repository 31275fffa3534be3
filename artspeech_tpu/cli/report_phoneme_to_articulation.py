"""Build the post-hoc TV/error report over a results directory.

Equivalent of reference report_phoneme_to_articulation.py. Config keys:
database_name, results_dir, articulators.

Usage: python -m artspeech_tpu.cli.report_phoneme_to_articulation --config cfg.yaml
"""

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG
from artspeech_tpu.eval.report import build_report


def main(cfg, args, tracker):
    report = build_report(
        cfg["results_dir"],
        sorted(cfg["articulators"]),
        DATASET_CONFIG[cfg["database_name"]],
        make_plots=cfg.get("make_plots", True),
    )
    if not report["errors_agg"].empty:
        print(report["errors_agg"])
    if not report["tv_corr"].empty:
        print(report["tv_corr"])
    return report


if __name__ == "__main__":
    run_experiment("Report phoneme-to-articulation", main)
