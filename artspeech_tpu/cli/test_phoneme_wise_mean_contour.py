"""Evaluate a fitted mean-contour table on a held-out split.

Equivalent of reference test_phoneme_wise_mean_contour.py:18-88.

Usage: python -m artspeech_tpu.cli.test_phoneme_wise_mean_contour --config cfg.yaml
Config keys: datadir, database_name, test_seq_dict, table_filepath (the
mean_contour_table.npz from training), vocab_filepath, articulators.
"""

import json
import os

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.core.vocab import load_vocabulary
from artspeech_tpu.data.batching import BucketedLoader
from artspeech_tpu.data.datasets import ArtSpeechDataset
from artspeech_tpu.eval.articulation import run_test
from artspeech_tpu.models.mean_contour import (
    MeanContourTable,
    make_mean_contour_forward,
)
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    vocabulary = load_vocabulary(cfg["vocab_filepath"])
    articulators = sorted(cfg["articulators"])

    table = MeanContourTable.load(cfg["table_filepath"])
    forward = make_mean_contour_forward(table)

    dataset = ArtSpeechDataset(
        cfg["datadir"],
        database_name,
        sequences_from_dict(cfg["datadir"], cfg["test_seq_dict"]),
        vocabulary,
        articulators,
        clip_tails=cfg.get("clip_tails", True),
    )
    loader = BucketedLoader(dataset, batch_size=cfg.get("batch_size", 8), shuffle=False)
    info = run_test(
        None,
        lambda params, tokens, lengths: forward(tokens, lengths),
        loader,
        articulators,
        to_mm=mm_per_unit(DATASET_CONFIG[database_name]),
        outputs_dir=cfg.get(
            "save_to", os.path.join(args.output_dir, "test_outputs", "0")
        ),
        regularize_out=cfg.get("regularize_out", False),
        loss_agg="sentence",
    )
    with open(os.path.join(args.output_dir, "test_results.json"), "w") as f:
        json.dump(info, f, indent=2)
    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Test phoneme-wise mean contour", main)
