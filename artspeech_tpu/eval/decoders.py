"""CTC decoders.

- ``greedy_ctc_decode``: in-graph argmax -> collapse-repeats -> drop-blank,
  fully vectorized (reference decoders.py:9-42 ``TopKDecoder`` semantics)
  with static output shapes; tokens are left-packed and padded with -1.
- ``beam_ctc_decode_device``: in-graph vectorized CTC prefix beam search —
  a ``lax.scan`` over time with static (beam, vocab) candidate tensors and
  an exact stay/extend merge, jit/vmap-able on TPU (the reference uses the
  flashlight-backed ``torchaudio.models.decoder.ctc_decoder``, a CPU
  decoder).
- ``beam_ctc_decode``: host-side prefix beam search, kept as the readable
  reference implementation the device decoder is golden-tested against.
"""

import math
from collections import defaultdict
from typing import List, Optional, Sequence, Union

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


_NEG = -1.0e30  # -inf stand-in: survives additions without producing nan


def beam_ctc_decode_device(
    emissions,
    lengths,
    beam_width: int = 16,
    blank_id: int = 0,
):
    """In-graph vectorized CTC prefix beam search (jit/vmap-able).

    Same semantics as :func:`beam_ctc_decode` (exact prefix-merging beam
    search over log-probabilities, no frame-level top-k restriction), as a
    ``lax.scan`` over time with static shapes — so it runs batched on TPU
    instead of per-sentence Python on the host. The merge is exact because
    beams stay pairwise-distinct by construction, so the only possible
    collision at each step is an extend(w, k) candidate landing on an
    existing beam v with ``prefix_v == prefix_w + [k]`` — detected with a
    (W, W, T) masked prefix comparison and folded into v's stay score.

    Args:
        emissions: (B, T, K) LOG-probabilities.
        lengths: (B,) valid frame counts.
    Returns:
        (tokens, token_lengths): (B, T) int32 left-packed ids padded with
        -1, and (B,) counts — same convention as ``greedy_ctc_decode``.
    """
    emissions = jnp.asarray(emissions)
    b, t, k = emissions.shape
    w = beam_width

    def decode_one(logp, n_valid):
        # state: prefixes (W, T), lens (W,), p_b/p_nb (W,)
        prefixes0 = jnp.full((w, t), -1, jnp.int32)
        lens0 = jnp.zeros((w,), jnp.int32)
        p_b0 = jnp.full((w,), _NEG).at[0].set(0.0)
        p_nb0 = jnp.full((w,), _NEG)
        pos = jnp.arange(t)

        def step(state, inputs):
            prefixes, lens, p_b, p_nb = state
            logp_t, t_idx = inputs
            p_tot = jnp.logaddexp(p_b, p_nb)
            valid = p_tot > _NEG / 2
            last = jnp.where(
                lens > 0,
                jnp.take_along_axis(
                    prefixes, jnp.maximum(lens - 1, 0)[:, None], axis=1
                )[:, 0],
                -1,
            )  # (W,)

            # stay candidates (prefix unchanged)
            stay_b = p_tot + logp_t[blank_id]
            stay_nb = jnp.where(
                last >= 0, p_nb + logp_t[jnp.maximum(last, 0)], _NEG
            )

            # extend candidates E[w, k]
            base = jnp.where(
                jnp.arange(k)[None, :] == last[:, None], p_b[:, None], p_tot[:, None]
            )
            ext = base + logp_t[None, :]
            ext = ext.at[:, blank_id].set(_NEG)
            ext = jnp.where(valid[:, None], ext, _NEG)

            # exact merge: extend(w, last_v) == stay(v) when
            # prefix_v == prefix_w + [last_v]
            len_ok = lens[:, None] == lens[None, :] + 1  # [v, w]
            pref_eq = jnp.all(
                (prefixes[:, None, :] == prefixes[None, :, :])
                | (pos[None, None, :] >= lens[None, :, None]),
                axis=-1,
            )  # [v, w]: prefixes agree on the first len_w positions
            m = len_ok & pref_eq & valid[:, None] & valid[None, :] & (last >= 0)[:, None]
            ext_at_lastv = ext.T[jnp.maximum(last, 0)]  # [v, w] = ext[w, last_v]
            contrib = jax.nn.logsumexp(
                jnp.where(m, ext_at_lastv, _NEG), axis=1
            )  # (V,)
            stay_nb = jnp.logaddexp(stay_nb, contrib)
            killed = (
                jnp.einsum(
                    "vw,vk->wk",
                    m.astype(jnp.float32),
                    jax.nn.one_hot(jnp.maximum(last, 0), k) * (last >= 0)[:, None],
                )
                > 0.5
            )
            ext = jnp.where(killed, _NEG, ext)

            scores = jnp.concatenate(
                [jnp.logaddexp(stay_b, stay_nb), ext.reshape(-1)]
            )  # (W + W*K,)
            _, top = jax.lax.top_k(scores, w)
            is_stay = top < w
            parent = jnp.where(is_stay, top, (top - w) // k)
            token = jnp.where(is_stay, -1, (top - w) % k)

            new_prefixes = prefixes[parent]
            new_lens = lens[parent] + (~is_stay).astype(jnp.int32)
            insert = (pos[None, :] == lens[parent][:, None]) & (~is_stay)[:, None]
            new_prefixes = jnp.where(insert, token[:, None], new_prefixes)
            new_p_b = jnp.where(is_stay, stay_b[parent], _NEG)
            new_p_nb = jnp.where(
                is_stay, stay_nb[parent], ext.reshape(-1)[jnp.maximum(top - w, 0)]
            )

            live = t_idx < n_valid
            out = (
                jnp.where(live, new_prefixes, prefixes),
                jnp.where(live, new_lens, lens),
                jnp.where(live, new_p_b, p_b),
                jnp.where(live, new_p_nb, p_nb),
            )
            return out, None

        (prefixes, lens, p_b, p_nb), _ = jax.lax.scan(
            step, (prefixes0, lens0, p_b0, p_nb0), (logp, jnp.arange(t))
        )
        best = jnp.argmax(jnp.logaddexp(p_b, p_nb))
        return prefixes[best], lens[best]

    return jax.vmap(decode_one)(emissions, jnp.asarray(lengths))


def beam_ctc_decode(
    emissions: np.ndarray,
    lengths: np.ndarray,
    beam_width: int = 16,
    blank_id: int = 0,
    frame_candidates: Union[int, str, None] = "auto",
) -> List[List[int]]:
    """Host-side CTC prefix beam search over log-probabilities.

    Args:
        emissions: (B, T, K) log probabilities (np).
        frame_candidates: per-frame top-k candidate restriction (a speed
            heuristic matching flashlight-style decoders). ``"auto"`` keeps
            the historical ``max(beam_width, 4)``; ``None`` disables the
            restriction, making the search exact over the full vocabulary —
            the semantics ``beam_ctc_decode_device`` implements and is
            golden-tested against for vocab > beam_width.
    Returns:
        best token sequence per batch element.
    """
    emissions = np.asarray(emissions)
    results = []
    for b in range(emissions.shape[0]):
        logp = emissions[b, : int(lengths[b])]
        results.append(
            _prefix_beam_search(logp, beam_width, blank_id, frame_candidates)
        )
    return results


def _prefix_beam_search(
    logp: np.ndarray,
    beam_width: int,
    blank_id: int,
    frame_candidates: Union[int, str, None] = "auto",
):
    T, K = logp.shape
    NEG = -math.inf
    if frame_candidates == "auto":
        frame_candidates = max(beam_width, 4)
    if frame_candidates is not None and frame_candidates < 1:
        # 0 / negative would silently select (nearly) the whole vocabulary
        # through the [-n:] slice idiom; demand an explicit None for exact.
        raise ValueError(f"frame_candidates must be >= 1 or None, got {frame_candidates}")
    # beams: prefix tuple -> (logp ending in blank, logp ending in non-blank)
    beams = {(): (0.0, NEG)}
    for t in range(T):
        new_beams = defaultdict(lambda: (NEG, NEG))
        if frame_candidates is None:
            top_k = list(range(K))
        else:
            # Restrict to top candidates at this frame for speed — but
            # ALWAYS include the blank, or live prefixes lose their "stay"
            # transition and probability mass is misallocated.
            top_k = list(np.argsort(logp[t])[-frame_candidates:])
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
