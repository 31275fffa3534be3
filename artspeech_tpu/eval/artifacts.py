"""Host-side artifact writers for evaluation outputs.

Reproduces the on-disk schema of reference
phoneme_to_articulation/__init__.py:121-297 (``save_outputs`` and
``tract_variables``): per-sentence directories holding
``contours/{frame}_{articulator}.npy`` (+ ``_true``), ``phonemes.csv`` and
``tract_variables.csv``. TPU-first split: all numerics (B-spline
regularization, tract variables for predictions *and* targets) are computed
batched on device by the caller; these writers only lay numpy results out on
disk.
"""

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

TV_NAMES = ("LA", "TTCD", "TBCD", "VEL")


def save_contours(
    sentence_id: str,
    frame_ids: Sequence[str],
    outputs: np.ndarray,
    targets: Optional[np.ndarray],
    phonemes: Sequence[str],
    articulators: Sequence[str],
    save_to: str,
):
    """Write per-frame contour npys + phonemes.csv for ONE sentence.

    Args:
        outputs/targets: (T, Nart, 2, D) already length-trimmed (and already
            B-spline regularized on device if requested).
    """
    sentence_dir = os.path.join(save_to, sentence_id)
    contours_dir = os.path.join(sentence_dir, "contours")
    os.makedirs(contours_dir, exist_ok=True)

    phoneme_data = []
    arts = sorted(articulators)
    for t, frame in enumerate(frame_ids):
        phoneme = phonemes[t] if t < len(phonemes) else ""
        phoneme_data.append(
            {"sentence": sentence_id, "frame": frame, "phoneme": phoneme}
        )
        for i_art, art in enumerate(arts):
            np.save(os.path.join(contours_dir, f"{frame}_{art}.npy"), outputs[t, i_art])
            if targets is not None:
                np.save(
                    os.path.join(contours_dir, f"{frame}_{art}_true.npy"),
                    targets[t, i_art],
                )
    pd.DataFrame(phoneme_data).to_csv(
        os.path.join(sentence_dir, "phonemes.csv"), index=False
    )


def tvs_to_records(
    sentence_id: str,
    frame_ids: Sequence[str],
    phonemes: Sequence[str],
    pred_tvs: Dict[str, Optional[dict]],
    target_tvs: Optional[Dict[str, Optional[dict]]],
    t_offset: int = 0,
) -> List[dict]:
    """Flatten device-computed TV dicts (arrays shaped (T,) / (T, 2)) into
    per-frame CSV records matching reference __init__.py:247-290."""
    records = []
    for t, frame in enumerate(frame_ids):
        tt = t + t_offset
        item = {
            "sentence": sentence_id,
            "frame": frame,
            "phoneme": phonemes[t] if t < len(phonemes) else "",
        }
        if target_tvs is not None:
            for tv in TV_NAMES:
                d = target_tvs.get(tv)
                if d is None:
                    continue
                item[f"{tv}_target"] = float(d["value"][tt])
                item[f"{tv}_target_poc_1_x"] = float(d["poc_1"][tt][0])
                item[f"{tv}_target_poc_1_y"] = float(d["poc_1"][tt][1])
                item[f"{tv}_target_poc_2_x"] = float(d["poc_2"][tt][0])
                item[f"{tv}_target_poc_2_y"] = float(d["poc_2"][tt][1])
        for tv in TV_NAMES:
            d = pred_tvs.get(tv)
            if d is None:
                continue
            item[f"{tv}_pred"] = float(d["value"][tt])
            item[f"{tv}_pred_poc_1_x"] = float(d["poc_1"][tt][0])
            item[f"{tv}_pred_poc_1_y"] = float(d["poc_1"][tt][1])
            item[f"{tv}_pred_poc_2_x"] = float(d["poc_2"][tt][0])
            item[f"{tv}_pred_poc_2_y"] = float(d["poc_2"][tt][1])
        records.append(item)
    return records


def save_tract_variables_csv(sentence_id: str, records: List[dict], save_to: str):
    sentence_dir = os.path.join(save_to, sentence_id)
    os.makedirs(sentence_dir, exist_ok=True)
    pd.DataFrame(records).to_csv(
        os.path.join(sentence_dir, "tract_variables.csv"), index=False
    )
