"""Precompute air columns for a corpus: contours -> tube walls -> npy.

Equivalent of reference scripts/shape_to_air_column.py:40-89, but the tube
generation is batched through ONE jitted program per bucket of frames
instead of a per-frame host call.

Usage: python -m artspeech_tpu.cli.shape_to_air_column --config cfg.yaml
Config keys: datadir, database_name, seq_dict (subject -> [sequences]),
articulators (default: the 11 tube articulators), batch_size.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG
from artspeech_tpu.core.constants import TUBE_ARTICULATORS
from artspeech_tpu.data.collectors import DATABASE_COLLECTORS
from artspeech_tpu.data.loaders import load_articulator_array
from artspeech_tpu.geometry.tube import generate_vocal_tract_tube_batch
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    datadir = cfg["datadir"]
    database_name = cfg["database_name"]
    config = DATASET_CONFIG[database_name]
    articulators = sorted(cfg.get("articulators") or TUBE_ARTICULATORS)
    batch_size = cfg.get("batch_size", 64)

    collector = DATABASE_COLLECTORS[database_name](datadir)
    sequences = sequences_from_dict(datadir, cfg["seq_dict"])

    tube_fn = jax.jit(
        lambda frames: generate_vocal_tract_tube_batch(frames, articulators)
    )

    n_written = 0
    for subject, sequence in sequences:
        seq_dir = os.path.join(datadir, subject, sequence)
        frame_ids = collector.get_frame_ids(subject, sequence)
        if not frame_ids:
            continue
        air_dir = os.path.join(seq_dir, "air_column")
        os.makedirs(air_dir, exist_ok=True)

        for start in range(0, len(frame_ids), batch_size):
            chunk = frame_ids[start : start + batch_size]
            frames = []
            kept_ids = []
            for frame_id in chunk:
                try:
                    arts = [
                        load_articulator_array(
                            os.path.join(
                                seq_dir,
                                "inference_contours",
                                f"{frame_id}_{articulator}.npy",
                            ),
                            norm_value=config.RES,
                        ).T  # (2, D)
                        for articulator in articulators
                    ]
                except FileNotFoundError:
                    continue
                frames.append(np.stack(arts))
                kept_ids.append(frame_id)
            if not frames:
                continue
            stack = np.stack(frames)  # (B, Nart, 2, D)
            if stack.shape[0] < batch_size:  # keep one jit signature
                pad = batch_size - stack.shape[0]
                stack = np.concatenate([stack, np.repeat(stack[-1:], pad, axis=0)])
            internal, external = jax.device_get(tube_fn(jnp.asarray(stack)))
            for i, frame_id in enumerate(kept_ids):
                air = np.stack([internal[i].T, external[i].T])  # (2, 2, 100)
                np.save(os.path.join(air_dir, f"{frame_id}.npy"), air)
                n_written += 1
    print(f"Wrote {n_written} air columns")
    return n_written


if __name__ == "__main__":
    run_experiment("Shape to air column", main)
