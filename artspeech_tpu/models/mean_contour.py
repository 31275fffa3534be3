"""Phoneme-wise mean-contour baseline (method A).

Equivalent of reference phoneme_to_articulation/phoneme_wise_mean_contour/
__init__.py:19-159: "training" collects per-frame (token, contour) rows and
inference returns the per-token mean contour (optionally weighted by the
frame's relative position inside the phoneme).

TPU-first redesign: instead of a pandas DataFrame sampled per sentence at
inference time, training reduces the corpus into a dense lookup table
  table[token]            -> (Nart, 2, D) mean contour, or
  table[token, pos_bin]   -> positional variant (the *intended* behavior of
                             the reference's weighted path, whose
                             functools.reduce at :89-95 is broken)
and inference is a single jittable gather — O(T) embedding lookup per
sentence, batchable and shardable like any other model.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class MeanContourTable:
    """Dense per-token (optionally per-position-bin) mean contour table."""

    table: np.ndarray  # (V, Nart, 2, D) or (V, K, Nart, 2, D)
    counts: np.ndarray  # (V,) or (V, K)
    positional: bool = False

    @property
    def n_bins(self) -> int:
        return self.table.shape[1] if self.positional else 1

    def save(self, path: str):
        np.savez(
            path, table=self.table, counts=self.counts, positional=self.positional
        )

    @classmethod
    def load(cls, path: str) -> "MeanContourTable":
        z = np.load(path)
        return cls(
            table=z["table"], counts=z["counts"], positional=bool(z["positional"])
        )


def relative_positions(tokens: Sequence[int]) -> np.ndarray:
    """Relative position in [0, 1] of each frame inside its phoneme run
    (reference phoneme_wise_mean_contour/__init__.py:19-29)."""
    tokens = list(tokens)
    rel = np.zeros(len(tokens), dtype=np.float32)
    i = 0
    while i < len(tokens):
        j = i
        while j < len(tokens) and tokens[j] == tokens[i]:
            j += 1
        run = j - i
        for k in range(run):
            rel[i + k] = (k + 1) / run
        i = j
    return rel


def fit_mean_contour(
    dataset,
    vocab_size: int,
    n_bins: int = 0,
    sample_frac: float = 1.0,
    seed: int = 0,
) -> MeanContourTable:
    """Accumulate per-token (x bin) contour means over a dataset.

    Args:
        dataset: ArtSpeechDataset-like; items carry ``tokens`` (T,) ids and
            ``targets`` (T, Nart, 2, D).
        n_bins: 0 -> plain per-token mean; >0 -> positional bins.
        sample_frac: fraction of frames to keep per token (the reference
            samples 10% with a fixed seed, :131-135); 1.0 uses everything.
    """
    rng = np.random.default_rng(seed)
    positional = n_bins > 0
    k = max(n_bins, 1)
    sums = None
    counts = np.zeros((vocab_size, k), dtype=np.int64)

    for idx in range(len(dataset)):
        item = dataset[idx]
        tokens = np.asarray(item["tokens"])
        targets = np.asarray(item["targets"], dtype=np.float64)
        if sums is None:
            sums = np.zeros((vocab_size, k) + targets.shape[1:], dtype=np.float64)
        if positional:
            rel = relative_positions(tokens)
            bins = np.minimum((rel * k).astype(np.int64), k - 1)
        else:
            bins = np.zeros(len(tokens), dtype=np.int64)
        keep = (
            rng.random(len(tokens)) < sample_frac
            if sample_frac < 1.0
            else np.ones(len(tokens), bool)
        )
        for t in np.nonzero(keep)[0]:
            sums[tokens[t], bins[t]] += targets[t]
            counts[tokens[t], bins[t]] += 1

    safe = np.maximum(counts, 1)[(...,) + (None,) * 3]
    table = (sums / safe).astype(np.float32)
    # Backfill empty positional bins from the token's overall mean.
    if positional:
        tok_counts = counts.sum(axis=1)
        tok_mean = sums.sum(axis=1) / np.maximum(tok_counts, 1)[:, None, None, None]
        empty = counts == 0
        table[empty] = tok_mean.astype(np.float32)[np.nonzero(empty)[0]]
        counts_out = counts
    else:
        table = table[:, 0]
        counts_out = counts[:, 0]
    return MeanContourTable(table=table, counts=counts_out, positional=positional)


def fit_mean_contour_reference_sampling(
    dataset,
    vocab_size: int,
    frac: float = 0.1,
    random_state: int = 0,
) -> MeanContourTable:
    """Parity mode: the reference's fixed-seed 10% row subsample, exactly.

    Reference phoneme_wise_mean_contour/__init__.py:103,130-135 calls
    ``df[df.token == token].sample(frac=0.1, random_state=0)`` at inference.
    With a fixed seed and a deterministic row order the selected subset per
    token is a constant, so it precomputes into the same dense lookup table
    as :func:`fit_mean_contour` — inference stays a single gather. Pandas
    itself picks the row positions here, so the selection matches the
    reference bit-for-bit for a same-ordered corpus.

    Tokens whose row count rounds ``frac`` down to zero would crash the
    reference (``torch.stack([])``); they fall back to the full mean here.
    """
    import pandas as pd

    per_token = [[] for _ in range(vocab_size)]
    shape = None
    for idx in range(len(dataset)):
        item = dataset[idx]
        tokens = np.asarray(item["tokens"])
        targets = np.asarray(item["targets"], dtype=np.float32)
        shape = targets.shape[1:]
        for t, tok in enumerate(tokens):
            per_token[int(tok)].append(targets[t])

    if shape is None:
        raise ValueError("empty dataset")
    table = np.zeros((vocab_size,) + shape, dtype=np.float32)
    counts = np.zeros(vocab_size, dtype=np.int64)
    for tok, rows in enumerate(per_token):
        if not rows:
            continue
        pos = (
            pd.DataFrame(index=np.arange(len(rows)))
            .sample(frac=frac, random_state=random_state)
            .index.to_numpy()
        )
        chosen = [rows[p] for p in pos] if len(pos) else rows
        table[tok] = np.mean(np.stack(chosen, axis=0), axis=0)
        counts[tok] = len(chosen)
    return MeanContourTable(table=table, counts=counts, positional=False)


def make_mean_contour_forward(table: MeanContourTable, beta: float = 10.0):
    """Build a jittable forward: (tokens (B, T), lengths (B,)) -> contours.

    Plain table: one gather. Positional table: softmin-weighted mix over
    position bins by |bin_center - rel_position| (intended semantics of
    reference forward_weighted_mean_contour :86-122).
    """
    jtable = jnp.asarray(table.table)

    if not table.positional:

        def forward(tokens, lengths=None, rel_positions=None):
            return jtable[tokens]  # (B, T, Nart, 2, D)

        return forward

    k = table.n_bins
    centers = (jnp.arange(k) + 0.5) / k

    def forward(tokens, lengths=None, rel_positions=None):
        if rel_positions is None:
            rel_positions = jnp.full(tokens.shape, 0.5, jtable.dtype)
        w = jax.nn.softmax(
            -beta * jnp.abs(rel_positions[..., None] - centers), axis=-1
        )  # (B, T, K)
        gathered = jtable[tokens]  # (B, T, K, Nart, 2, D)
        return jnp.einsum("btk,btk...->bt...", w, gathered)

    return forward
