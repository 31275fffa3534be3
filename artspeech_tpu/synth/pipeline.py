"""Phoneme -> contour -> air-column synthesis pipeline.

Equivalent of reference generate_vocal_tract_shape_v2.py:270-450 — the
"serving" path that turns TextGrid phoneme sequences into a synthetic corpus
(inference_contours/*.npy, air_column/*.npy, xarticul/*.txt,
target_sequence.txt) with the same directory schema as the training corpus,
so the phoneme recognizer can evaluate synthesized articulation
(SyntheticPhonemeRecognitionDataset in the reference).

TPU-first redesign: the reference loops sentences and frames on the host
(model forward per sentence, shapely tube per frame). Here sentences are
bucketed into fixed shapes and EVERYTHING numeric — model forward, B-spline
regularization, incisor injection, vocal-tract tube walls — runs as one
jitted XLA program per bucket; the host only writes npy/txt files.
"""

import logging
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from artspeech_tpu.core.config import DatasetConfig
from artspeech_tpu.core.constants import UPPER_INCISOR
from artspeech_tpu.core.vocab import token_id
from artspeech_tpu.data.batching import pad_to, pick_bucket
from artspeech_tpu.data.collectors import DATABASE_COLLECTORS
from artspeech_tpu.geometry.tube import generate_vocal_tract_tube_batch
from artspeech_tpu.ops.bspline import regularize_bsplines
from artspeech_tpu.synth.reference_contour import CANONICAL_UPPER_INCISOR
from artspeech_tpu.utils.io import npy_to_xarticul

logger = logging.getLogger(__name__)


class SynthesisDataset:
    """Tokens-only sentence dataset with the canonical incisor reference
    (reference generate_vocal_tract_shape_v2.py:41-121)."""

    def __init__(
        self,
        datadir: str,
        database_name: str,
        sequences,
        vocabulary: Dict[str, int],
        articulators: Sequence[str],
        voiced_tokens: Optional[Sequence[str]] = None,
    ):
        self.vocabulary = vocabulary
        self.articulators = sorted(articulators)
        self.voiced_tokens = set(voiced_tokens or [])
        collector = DATABASE_COLLECTORS[database_name](datadir)
        self.data = collector.collect_data(sequences)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int) -> dict:
        item = self.data[index]
        tokens = item["phonemes"]
        return {
            "sentence_name": item["sentence_name"],
            "subject": item["subject"],
            "tokens": np.array(
                [token_id(t, self.vocabulary) for t in tokens], np.int32
            ),
            "phonemes": list(tokens),
            "voicing": np.array(
                [float(t in self.voiced_tokens) for t in tokens], np.float32
            ),
            "length": len(tokens),
        }


def make_synthesis_step(
    forward_fn: Callable,
    articulators: Sequence[str],
    regularize_outputs: bool = True,
    wall_points: int = 100,
):
    """One fused program: tokens -> contours -> smoothed -> +incisor -> tube.

    ``forward_fn(tokens, lengths) -> (B, T, Nart, 2, D)`` is the model
    (closure over params). Returns a jitted fn producing
    {contours, internal_wall, external_wall}.
    """
    articulators = sorted(articulators)
    ref = jnp.asarray(CANONICAL_UPPER_INCISOR)  # (2, D)

    if UPPER_INCISOR in articulators:
        full_arts = list(articulators)
        ref_idx = None
    else:
        full_arts = sorted(articulators + [UPPER_INCISOR])
        ref_idx = full_arts.index(UPPER_INCISOR)

    @jax.jit
    def synth_step(tokens, lengths):
        outputs = forward_fn(tokens, lengths)  # (B, T, Nart, 2, D)
        if regularize_outputs:
            outputs = jnp.swapaxes(
                regularize_bsplines(jnp.swapaxes(outputs, -1, -2)), -1, -2
            )
        if ref_idx is not None:
            b, t = outputs.shape[:2]
            ref_full = jnp.broadcast_to(ref, (b, t, 1) + ref.shape)
            merged = jnp.concatenate(
                [outputs[:, :, :ref_idx], ref_full, outputs[:, :, ref_idx:]], axis=2
            )
        else:
            merged = outputs
        flat = merged.reshape((-1,) + merged.shape[2:])
        internal, external = generate_vocal_tract_tube_batch(
            flat, full_arts, wall_points=wall_points
        )
        shape_bt = merged.shape[:2]
        return {
            "contours": merged,
            "internal_wall": internal.reshape(shape_bt + internal.shape[1:]),
            "external_wall": external.reshape(shape_bt + external.shape[1:]),
        }

    return synth_step, full_arts


def synthesize_corpus(
    forward_fn: Callable,
    dataset: SynthesisDataset,
    save_to: str,
    dataset_config: DatasetConfig,
    regularize_outputs: bool = True,
    batch_size: int = 8,
    buckets: Sequence[int] = (32, 64, 128, 256, 512),
    save_air_column: bool = True,
    save_xarticul: bool = True,
) -> List[str]:
    """Run the full synthesis over a dataset, writing the synthetic corpus.

    Output layout per sentence (reference v2:375-439):
        {save_to}/{subject}/{sentence_name}/inference_contours/{frame}_{art}.npy
        .../air_column/{frame}.npy          ((2, 2, wall_points) walls)
        .../xarticul/{frame}.txt
        .../target_sequence.txt
    Returns the list of sentence directories written.
    """
    synth_step, full_arts = make_synthesis_step(
        forward_fn, dataset.articulators, regularize_outputs
    )

    # Sort on the raw collector records (building a dataset item per sort
    # key would double the host preprocessing).
    order = sorted(
        range(len(dataset)), key=lambda i: len(dataset.data[i]["phonemes"])
    )
    max_len = max(
        (len(dataset.data[i]["phonemes"]) for i in order), default=0
    )
    if buckets and max_len > max(buckets):
        # pick_bucket would silently TRUNCATE longer sentences; extend the
        # bucket list instead (one extra compile, full-length output).
        extended = ((max_len + 63) // 64) * 64
        logger.warning(
            "Longest sentence (%d frames) exceeds the largest bucket (%d); "
            "adding a %d-frame bucket.", max_len, max(buckets), extended,
        )
        buckets = tuple(buckets) + (extended,)
    written = []
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        items = [dataset[i] for i in idx]
        bucket = pick_bucket(max(it["length"] for it in items), buckets)
        tokens = np.stack(
            [pad_to(it["tokens"], bucket) for it in items]
        )
        lengths = np.array([min(it["length"], bucket) for it in items], np.int32)
        if len(items) < batch_size:  # pad batch dim to keep signatures static
            pad_n = batch_size - len(items)
            tokens = np.concatenate([tokens, np.zeros((pad_n, bucket), np.int32)])
            lengths = np.concatenate([lengths, np.zeros(pad_n, np.int32)])

        result = jax.device_get(synth_step(jnp.asarray(tokens), jnp.asarray(lengths)))

        for j, item in enumerate(items):
            L = int(lengths[j])
            sentence_dir = os.path.join(save_to, item["subject"], item["sentence_name"])
            written.append(sentence_dir)
            contours_dir = os.path.join(sentence_dir, "inference_contours")
            os.makedirs(contours_dir, exist_ok=True)
            with open(os.path.join(sentence_dir, "target_sequence.txt"), "w") as f:
                f.write(" ".join(item["phonemes"][:L]))

            contours = result["contours"][j, :L]  # (L, Nart+1, 2, D)
            for t in range(L):
                frame_id = f"{t + 1:04d}"
                for i_art, art in enumerate(full_arts):
                    np.save(
                        os.path.join(contours_dir, f"{frame_id}_{art}.npy"),
                        contours[t, i_art],
                    )
            if save_air_column:
                air_dir = os.path.join(sentence_dir, "air_column")
                os.makedirs(air_dir, exist_ok=True)
                for t in range(L):
                    frame_id = f"{t + 1:04d}"
                    air = np.stack(
                        [
                            result["internal_wall"][j, t].T,
                            result["external_wall"][j, t].T,
                        ]
                    )  # (2, 2, wall_points)
                    np.save(os.path.join(air_dir, f"{frame_id}.npy"), air)
            if save_xarticul:
                xart_dir = os.path.join(sentence_dir, "xarticul")
                os.makedirs(xart_dir, exist_ok=True)
                res = dataset_config.RES
                for t in range(L):
                    frame_id = f"{t + 1:04d}"
                    lines = npy_to_xarticul(
                        result["internal_wall"][j, t] * res
                    ) + npy_to_xarticul(result["external_wall"][j, t] * res)
                    with open(os.path.join(xart_dir, f"{frame_id}.txt"), "w") as f:
                        f.write("\n".join(lines))
    return written
