"""Report tooling tests + CLI import smoke + viz smoke."""

import importlib
import json
import os

import numpy as np
import pandas as pd
import pytest


CLI_MODULES = [
    "train_phoneme_to_articulation",
    "test_phoneme_to_articulation",
    "train_phoneme_to_articulation_transformer",
    "test_phoneme_to_articulation_transformer",
    "train_phoneme_wise_mean_contour",
    "test_phoneme_wise_mean_contour",
    "train_principal_components_autoencoder",
    "test_principal_components_autoencoder",
    "train_phoneme_to_principal_components",
    "test_phoneme_to_principal_components",
    "train_articulatory_pca",
    "train_phoneme_recognition",
    "test_phoneme_recognition",
    "generate_vocal_tract_shape",
    "report_phoneme_to_articulation",
    "shape_to_air_column",
    "calculate_normalization_statistics",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_module_imports(name):
    importlib.import_module(f"artspeech_tpu.cli.{name}")


def _write_fake_results(results_dir, articulators, n_frames=6):
    rng = np.random.default_rng(0)
    sdir = os.path.join(results_dir, "test_outputs", "0", "s1_S01-0.0_1.0")
    contours_dir = os.path.join(sdir, "contours")
    os.makedirs(contours_dir, exist_ok=True)
    rows, tv_rows = [], []
    for t in range(n_frames):
        frame = f"{t + 1:04d}"
        phoneme = "a" if t < 3 else "p"
        rows.append({"sentence": "s1_S01-0.0_1.0", "frame": frame, "phoneme": phoneme})
        tv_row = {"sentence": "s1_S01-0.0_1.0", "frame": frame, "phoneme": phoneme}
        for tv in ("LA", "TTCD", "TBCD", "VEL"):
            tv_row[f"{tv}_pred"] = rng.uniform(0.01, 0.2)
            tv_row[f"{tv}_target"] = rng.uniform(0.01, 0.2)
            for w in ("pred", "target"):
                for p in ("poc_1", "poc_2"):
                    tv_row[f"{tv}_{w}_{p}_x"] = rng.uniform()
                    tv_row[f"{tv}_{w}_{p}_y"] = rng.uniform()
        tv_rows.append(tv_row)
        for art in articulators:
            np.save(
                os.path.join(contours_dir, f"{frame}_{art}.npy"),
                rng.uniform(size=(2, 50)).astype(np.float32),
            )
            np.save(
                os.path.join(contours_dir, f"{frame}_{art}_true.npy"),
                rng.uniform(size=(2, 50)).astype(np.float32),
            )
    pd.DataFrame(rows).to_csv(os.path.join(sdir, "phonemes.csv"), index=False)
    pd.DataFrame(tv_rows).to_csv(os.path.join(sdir, "tract_variables.csv"), index=False)
    return sdir


def test_build_report(tmp_path):
    from artspeech_tpu.core.config import DATASET_CONFIG
    from artspeech_tpu.eval.report import build_report

    arts = ["tongue", "upper-lip", "lower-lip"]
    results_dir = str(tmp_path)
    _write_fake_results(results_dir, arts)
    report = build_report(
        results_dir, arts, DATASET_CONFIG["artspeech"], make_plots=False
    )
    assert not report["errors"].empty
    assert len(report["errors"]) == 6 * 3
    assert set(report["errors"].articulator) == set(arts)
    assert os.path.isfile(os.path.join(results_dir, "error_report_full.csv"))
    assert os.path.isfile(os.path.join(results_dir, "error_report_agg.csv"))
    assert os.path.isfile(os.path.join(results_dir, "tract_variables.csv"))
    assert os.path.isfile(os.path.join(results_dir, "TV_corr_report.csv"))
    assert set(report["tv_corr"].TV) == {"LA", "TTCD", "TBCD", "VEL"}
    # p2cp/euclidean positive and finite
    assert (report["errors"].p2cp > 0).all()
    assert np.isfinite(report["errors"].euclidean_mm).all()


def test_viz_smoke(tmp_path):
    from artspeech_tpu.synth.viz import (
        plot_vocal_tract_shape,
        save_vocal_tract_shapes,
        uint16_to_uint8,
    )

    rng = np.random.default_rng(0)
    arts = ["tongue", "upper-lip"]
    outputs = rng.uniform(size=(2, 2, 2, 50)).astype(np.float32)
    save_vocal_tract_shapes(arts, outputs, ["a", "b"], str(tmp_path / "plots"))
    assert len(os.listdir(tmp_path / "plots")) == 2

    img = uint16_to_uint8(np.arange(100, dtype=np.uint16).reshape(10, 10))
    assert img.dtype == np.uint8 and img.max() == 255 and img.min() == 0


def test_video_smoke(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from artspeech_tpu.synth.viz import make_vocal_tract_shape_video

    rng = np.random.default_rng(0)
    arts = ["tongue", "upper-lip"]
    outputs = rng.uniform(size=(3, 2, 2, 50)).astype(np.float32)
    path = str(tmp_path / "test.avi")
    ok = make_vocal_tract_shape_video(arts, outputs, ["a", "b", "c"], path, framerate=5)
    assert ok and os.path.isfile(path) and os.path.getsize(path) > 0
