"""CTC decoders.

- ``greedy_ctc_decode``: in-graph argmax -> collapse-repeats -> drop-blank,
  fully vectorized (reference decoders.py:9-42 ``TopKDecoder`` semantics)
  with static output shapes; tokens are left-packed and padded with -1.
- ``beam_ctc_decode``: host-side prefix beam search (the reference uses the
  flashlight-backed ``torchaudio.models.decoder.ctc_decoder``, which has no
  TPU equivalent — train/eval fast paths use greedy in-graph, reports can use
  the beam).
"""

import math
from collections import defaultdict
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def greedy_ctc_decode(emissions, lengths, blank_id: int = 0):
    """Vectorized greedy CTC decode.

    Args:
        emissions: (B, T, K) scores (logits or probabilities).
        lengths: (B,) valid lengths.
    Returns:
        (tokens, token_lengths): (B, T) int32 left-packed decoded ids padded
        with -1, and (B,) counts. Jit-safe (static shapes).
    """
    best = jnp.argmax(emissions, axis=-1)  # (B, T)
    t = best.shape[1]
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    prev = jnp.concatenate([jnp.full_like(best[:, :1], -1), best[:, :-1]], axis=1)
    keep = (best != prev) & (best != blank_id) & valid  # (B, T)

    # Left-pack kept tokens to static shape: position = cumsum of keep - 1;
    # dropped entries scatter to an out-of-bounds slot (mode="drop").
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    scatter_pos = jnp.where(keep, pos, t)
    out = jax.vmap(
        lambda p, v: jnp.full((t,), -1, jnp.int32).at[p].set(
            v.astype(jnp.int32), mode="drop"
        )
    )(scatter_pos, best)
    token_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out, token_lengths


def decode_to_strings(tokens: np.ndarray, token_lengths: np.ndarray) -> List[str]:
    """Token-id arrays -> space-joined id strings (the reference compares
    PER over token-id 'sentences', metrics.py:57-84)."""
    return [
        " ".join(str(int(tok)) for tok in row[:length])
        for row, length in zip(np.asarray(tokens), np.asarray(token_lengths))
    ]


def beam_ctc_decode(
    emissions: np.ndarray,
    lengths: np.ndarray,
    beam_width: int = 16,
    blank_id: int = 0,
) -> List[List[int]]:
    """Host-side CTC prefix beam search over log-probabilities.

    Args:
        emissions: (B, T, K) log probabilities (np).
    Returns:
        best token sequence per batch element.
    """
    emissions = np.asarray(emissions)
    results = []
    for b in range(emissions.shape[0]):
        logp = emissions[b, : int(lengths[b])]
        results.append(_prefix_beam_search(logp, beam_width, blank_id))
    return results


def _prefix_beam_search(logp: np.ndarray, beam_width: int, blank_id: int):
    T, K = logp.shape
    NEG = -math.inf
    # beams: prefix tuple -> (logp ending in blank, logp ending in non-blank)
    beams = {(): (0.0, NEG)}
    for t in range(T):
        new_beams = defaultdict(lambda: (NEG, NEG))
        # Restrict to top candidates at this frame for speed — but ALWAYS
        # include the blank, or live prefixes lose their "stay" transition
        # and probability mass is misallocated.
        top_k = list(np.argsort(logp[t])[-max(beam_width, 4) :])
        if blank_id not in top_k:
            top_k.append(blank_id)
        for prefix, (p_b, p_nb) in beams.items():
            p_tot = np.logaddexp(p_b, p_nb)
            for k in top_k:
                p_k = logp[t, k]
                if k == blank_id:
                    nb_b, nb_nb = new_beams[prefix]
                    new_beams[prefix] = (np.logaddexp(nb_b, p_tot + p_k), nb_nb)
                    continue
                new_prefix = prefix + (int(k),)
                nb_b, nb_nb = new_beams[new_prefix]
                if prefix and prefix[-1] == k:
                    # Repeating last token: only extend from blank-ending mass.
                    new_beams[new_prefix] = (nb_b, np.logaddexp(nb_nb, p_b + p_k))
                    sb_b, sb_nb = new_beams[prefix]
                    new_beams[prefix] = (sb_b, np.logaddexp(sb_nb, p_nb + p_k))
                else:
                    new_beams[new_prefix] = (nb_b, np.logaddexp(nb_nb, p_tot + p_k))
        beams = dict(
            sorted(
                new_beams.items(),
                key=lambda kv: -np.logaddexp(kv[1][0], kv[1][1]),
            )[:beam_width]
        )
    best = max(beams.items(), key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]))
    return list(best[0])
