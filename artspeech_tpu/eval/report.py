"""Post-hoc error/TV report over dumped test artifacts.

Equivalent of reference report_phoneme_to_articulation.py:27-296: aggregates
per-sentence tract_variables.csv into a TV report with per-sentence
pred/target Pearson correlations, recomputes per-frame P2CP / Euclidean
errors from the dumped contour npys (a regression check on the artifacts),
and renders TV-vs-frame plots with phoneme bands.

TPU-first: the per-frame error recomputation batches ALL frames of a
sentence through one jnp call instead of the reference's per-frame torch
loop.
"""

import os
from glob import glob
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd

from artspeech_tpu.core.config import DatasetConfig, mm_per_unit
from artspeech_tpu.ops.distances import (
    euclidean_distance,
    mean_p2cp_channel_major,
)

TV_COLORS = {"LA": "tab:blue", "TTCD": "tab:orange", "TBCD": "tab:green", "VEL": "tab:red"}


def aggregate_tract_variables(sentences_dirs: Sequence[str]) -> pd.DataFrame:
    frames = [
        pd.read_csv(os.path.join(d, "tract_variables.csv"))
        for d in sentences_dirs
        if os.path.isfile(os.path.join(d, "tract_variables.csv"))
    ]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames).sort_values(["sentence", "frame"])


def sentence_error_frame(
    sentence_dir: str,
    articulators: Sequence[str],
    to_mm: float,
) -> List[dict]:
    """Recompute per-(frame, articulator) P2CP/Euclidean from dumped npys —
    batched over all frames at once."""
    df = pd.read_csv(os.path.join(sentence_dir, "phonemes.csv"))
    sentence_name = os.path.basename(sentence_dir)
    contours_dir = os.path.join(sentence_dir, "contours")
    preds, trues, rows = [], [], []
    for _, row in df.iterrows():
        frame_str = "%04d" % int(row["frame"]) if str(row["frame"]).isdigit() else str(row["frame"])
        frame_preds, frame_trues = [], []
        ok = True
        for articulator in articulators:
            p = os.path.join(contours_dir, f"{frame_str}_{articulator}.npy")
            t = os.path.join(contours_dir, f"{frame_str}_{articulator}_true.npy")
            if not (os.path.isfile(p) and os.path.isfile(t)):
                ok = False
                break
            frame_preds.append(np.load(p))
            frame_trues.append(np.load(t))
        if not ok:
            continue
        preds.append(np.stack(frame_preds))
        trues.append(np.stack(frame_trues))
        rows.append(row)
    if not preds:
        return []

    pred = jnp.asarray(np.stack(preds))  # (T, Nart, 2, D)
    true = jnp.asarray(np.stack(trues))
    p2cp = np.asarray(mean_p2cp_channel_major(pred, true))  # (T, Nart)
    eucl = np.asarray(euclidean_distance(pred, true).mean(axis=-1))  # (T, Nart)

    records = []
    for t, row in enumerate(rows):
        for i, articulator in enumerate(articulators):
            records.append(
                {
                    "sentence_name": sentence_name,
                    "frame": row["frame"],
                    "phoneme": row["phoneme"],
                    "articulator": articulator,
                    "p2cp": float(p2cp[t, i]),
                    "p2cp_mm": float(p2cp[t, i]) * to_mm,
                    "euclidean": float(eucl[t, i]),
                    "euclidean_mm": float(eucl[t, i]) * to_mm,
                }
            )
    return records


def tv_correlation_report(df_tvs: pd.DataFrame) -> pd.DataFrame:
    """Per-TV pred/target Pearson correlation stats over sentences
    (reference report:258-285)."""
    data = []
    for tv in TV_COLORS:
        if f"{tv}_pred" not in df_tvs or f"{tv}_target" not in df_tvs:
            continue
        corrs = []
        for _, group in df_tvs.groupby("sentence"):
            if len(group) > 1 and group[f"{tv}_target"].std() > 0:
                corrs.append(
                    group[f"{tv}_target"].corr(group[f"{tv}_pred"])
                )
        corrs = pd.Series(corrs, dtype=float)
        data.append(
            {
                "TV": tv,
                "mean": corrs.mean(),
                "std": corrs.std(),
                "min": corrs.min(),
                "max": corrs.max(),
            }
        )
    return pd.DataFrame(data)


def plot_tvs_for_sentence(
    df: pd.DataFrame,
    sentence_name: str,
    plots_dir: str,
    suffix: Optional[str] = None,
    which: str = "both",
    TVs: Optional[Sequence[str]] = None,
):
    """TV-vs-frame plot with alternating phoneme bands (reference :27-125)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    TVs = list(TVs or TV_COLORS.keys())
    os.makedirs(plots_dir, exist_ok=True)

    fig, ax = plt.subplots(figsize=(25, 7))
    y_max = max(
        float(df[f"{tv}_{w}"].max())
        for tv in TV_COLORS
        for w in ("pred", "target")
        if f"{tv}_{w}" in df
    )
    for tv in TVs:
        if which in ("pred", "both"):
            ax.plot(df.frame, df[f"{tv}_pred"], color=TV_COLORS[tv], label=f"{tv} pred")
        if which in ("target", "both"):
            ax.plot(
                df.frame,
                df[f"{tv}_target"],
                linestyle="--" if which == "both" else "-",
                color=TV_COLORS[tv],
                label=f"{tv} target",
            )
    # alternating phoneme bands
    frames = list(df.frame)
    phonemes = list(df.phoneme)
    start = 0
    band = 0
    for i in range(1, len(frames) + 1):
        if i == len(frames) or phonemes[i] != phonemes[start]:
            color = "lightgray" if band % 2 == 0 else "white"
            ax.axvspan(frames[start], frames[i - 1], alpha=0.3, color=color)
            ax.text(frames[start], y_max + 2 + 3 * (band % 4), str(phonemes[start]), fontsize=12)
            start = i
            band += 1
    ax.set_ylim(-2, y_max + 18)
    ax.set_xlabel("Frame Number", fontsize=18)
    ax.set_ylabel("TV value (mm)", fontsize=18)
    ax.grid(True, "major")
    fig.tight_layout()
    name = f"TVs_{sentence_name}" + (f"_{suffix}" if suffix else "")
    fig.savefig(os.path.join(plots_dir, f"{name}.jpg"))
    plt.close(fig)


def build_report(
    results_dir: str,
    articulators: Sequence[str],
    dataset_config: DatasetConfig,
    make_plots: bool = True,
) -> Dict[str, pd.DataFrame]:
    """Full report over {results_dir}/test_outputs/0/* (reference main)."""
    sentences_basedir = os.path.join(results_dir, "test_outputs", "0")
    sentences_dirs = sorted(
        d
        for d in glob(os.path.join(sentences_basedir, "*"))
        if os.path.isdir(d)
    )
    to_mm = mm_per_unit(dataset_config)

    df_tvs = aggregate_tract_variables(sentences_dirs)
    if not df_tvs.empty:
        for tv in TV_COLORS:
            if f"{tv}_pred" in df_tvs:
                df_tvs[f"{tv}_pred"] *= to_mm
                df_tvs[f"{tv}_target"] *= to_mm
                df_tvs[f"{tv}_abs_error"] = (
                    df_tvs[f"{tv}_target"] - df_tvs[f"{tv}_pred"]
                ).abs()
        df_tvs.to_csv(os.path.join(results_dir, "tract_variables.csv"), index=False)

    records = []
    for sentence_dir in sentences_dirs:
        records.extend(sentence_error_frame(sentence_dir, articulators, to_mm))
        if make_plots and not df_tvs.empty:
            name = os.path.basename(sentence_dir)
            df_s = df_tvs[df_tvs.sentence == name]
            if len(df_s):
                plot_tvs_for_sentence(
                    df_s, name, os.path.join(sentence_dir, "plots")
                )

    df_errors = pd.DataFrame(records)
    if not df_errors.empty:
        df_errors.to_csv(
            os.path.join(results_dir, "error_report_full.csv"), index=False
        )
        df_agg = (
            df_errors.groupby("articulator")
            .agg(
                {
                    "p2cp": ["mean", "std", "min", "max"],
                    "p2cp_mm": ["mean", "std", "min", "max"],
                    "euclidean": ["mean", "std", "min", "max"],
                    "euclidean_mm": ["mean", "std", "min", "max"],
                }
            )
            .reset_index()
        )
        df_agg.to_csv(os.path.join(results_dir, "error_report_agg.csv"), index=False)
    else:
        df_agg = pd.DataFrame()

    df_corr = tv_correlation_report(df_tvs) if not df_tvs.empty else pd.DataFrame()
    if not df_corr.empty:
        df_corr.to_csv(os.path.join(results_dir, "TV_corr_report.csv"), index=False)

    return {"tract_variables": df_tvs, "errors": df_errors, "errors_agg": df_agg, "tv_corr": df_corr}
