"""Fit classical per-articulator PCA and export PCAEncoder/PCADecoder params.

Equivalent of reference train_articulatory_PCA.py:38-202, with the sklearn
``IncrementalPCA.partial_fit`` loop replaced by one exact SVD per articulator
(artspeech_tpu.ops.pca). The fitted {mean, eigenvectors, eigenvalues} are
saved in the MultiEncoder/MultiDecoder (encoder_cls="PCA") parameter schema
so downstream losses/wrappers load them exactly like trained AE params.

Usage: python -m artspeech_tpu.cli.train_articulatory_pca --config cfg.yaml
"""

import json
import os

import numpy as np

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.data.pc_datasets import (
    AutoencoderDataset,
    compute_normalization_statistics,
    load_norm_stats,
)
from artspeech_tpu.models.autoencoder import normalize_indices_dict
from artspeech_tpu.ops.pca import explained_variance_ratio, fit_pca
from artspeech_tpu.train.checkpoint import save_params
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    datadir = cfg["datadir"]
    database_name = cfg["database_name"]
    indices_dict = normalize_indices_dict(cfg["indices_dict"])
    articulators = sorted(indices_dict.keys())
    clip_tails = cfg.get("clip_tails", True)

    stats_dir = os.path.join(datadir, "normalization_statistics")
    if not os.path.isdir(stats_dir):
        compute_normalization_statistics(
            datadir,
            database_name,
            sequences_from_dict(datadir, cfg["train_seq_dict"]),
            articulators,
            clip_tails=clip_tails,
            save_to=stats_dir,
        )
    norm_stats = load_norm_stats(datadir, articulators)

    dataset = AutoencoderDataset(
        datadir,
        database_name,
        sequences_from_dict(datadir, cfg["train_seq_dict"]),
        articulators,
        clip_tails=clip_tails,
        norm_stats=norm_stats,
    )
    # All frames, per articulator: (N, 2*D).
    frames = np.stack([dataset[i]["inputs"] for i in range(len(dataset))])

    enc_params = {}
    dec_params = {}
    report = {}
    for i, articulator in enumerate(articulators):
        x = frames[:, i, :]
        k = len(indices_dict[articulator])
        pca = fit_pca(x, k)
        evr = explained_variance_ratio(pca["eigenvalues"], float(x.var(axis=0).sum()))
        report[articulator] = {
            "num_components": k,
            "explained_variance_ratio": [float(v) for v in evr],
        }
        # Parameter names follow MultiEncoder/MultiDecoder(encoder_cls="PCA"):
        # per-articulator submodules named enc_/dec_{articulator}.
        enc_params[f"enc_{articulator}"] = {
            "mean": pca["mean"],
            "eigenvectors": pca["eigenvectors"],
            "eigenvalues": pca["eigenvalues"],
        }
        dec_params[f"dec_{articulator}"] = {
            "mean": pca["mean"],
            "eigenvectors": pca["eigenvectors"],
            "eigenvalues": pca["eigenvalues"],
        }

    out_dir = os.path.join(args.output_dir, "pca")
    save_params(os.path.join(out_dir, "encoder"), enc_params)
    save_params(os.path.join(out_dir, "decoder"), dec_params)
    with open(os.path.join(args.output_dir, "pca_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    tracker.log_dict(report, "pca_report.json")
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    run_experiment("Fit articulatory PCA", main)
