"""In-graph CTC beam search vs the host reference implementation.

beam_ctc_decode_device must reproduce beam_ctc_decode exactly when the host
decoder's per-frame top-k restriction is inactive (vocab <= beam width), on
random and on adversarial (peaked / repeat-heavy) emissions.
"""

import numpy as np
import jax.numpy as jnp

from artspeech_tpu.eval.decoders import (
    beam_ctc_decode,
    beam_ctc_decode_device,
    greedy_ctc_decode,
)


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_device_beam_matches_host_beam_random():
    rng = np.random.default_rng(0)
    B, T, K, W = 5, 17, 7, 16
    logp = _log_softmax(rng.normal(size=(B, T, K)).astype(np.float32) * 2.0)
    lengths = np.array([17, 11, 1, 17, 6], np.int32)
    host = beam_ctc_decode(logp, lengths, beam_width=W)
    toks, lens = beam_ctc_decode_device(jnp.asarray(logp), jnp.asarray(lengths),
                                        beam_width=W)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i in range(B):
        assert list(toks[i, : lens[i]]) == host[i], f"row {i}"


def test_device_beam_matches_host_beam_peaked_and_repeats():
    rng = np.random.default_rng(1)
    B, T, K, W = 4, 20, 6, 12
    # peaked: near-deterministic paths with repeats and blanks
    ids = rng.integers(0, K, size=(B, T))
    logits = np.full((B, T, K), -4.0, np.float32)
    for b in range(B):
        logits[b, np.arange(T), ids[b]] = 4.0
    # add frames where blank and a token tie closely (merge-sensitive)
    logits[:, ::3, 0] = 3.9
    logp = _log_softmax(logits)
    lengths = np.full((B,), T, np.int32)
    host = beam_ctc_decode(logp, lengths, beam_width=W)
    toks, lens = beam_ctc_decode_device(jnp.asarray(logp), jnp.asarray(lengths),
                                        beam_width=W)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for b in range(B):
        assert list(toks[b, : lens[b]]) == host[b], f"row {b}"


def test_device_beam_agrees_with_greedy_when_deterministic():
    rng = np.random.default_rng(2)
    B, T, K = 3, 12, 5
    ids = rng.integers(0, K, size=(B, T))
    logits = np.full((B, T, K), -12.0, np.float32)
    for b in range(B):
        logits[b, np.arange(T), ids[b]] = 12.0
    logp = _log_softmax(logits)
    lengths = np.full((B,), T, np.int32)
    g_toks, g_lens = greedy_ctc_decode(jnp.asarray(logp), jnp.asarray(lengths))
    b_toks, b_lens = beam_ctc_decode_device(jnp.asarray(logp), jnp.asarray(lengths),
                                            beam_width=8)
    for b in range(B):
        assert list(np.asarray(b_toks)[b, : int(b_lens[b])]) == list(
            np.asarray(g_toks)[b, : int(g_lens[b])]
        )


def test_device_beam_matches_exact_host_when_vocab_exceeds_beam():
    """Production regime (advisor r2): vocab K=31 > beam W=16. The device
    decoder never restricts per-frame candidates, so it must match the host
    search run in exact mode (frame_candidates=None); the restricted host
    default is allowed to differ here."""
    rng = np.random.default_rng(3)
    B, T, K, W = 4, 23, 31, 16
    logp = _log_softmax(rng.normal(size=(B, T, K)).astype(np.float32) * 2.0)
    lengths = np.array([23, 15, 7, 23], np.int32)
    host_exact = beam_ctc_decode(
        logp, lengths, beam_width=W, frame_candidates=None
    )
    toks, lens = beam_ctc_decode_device(
        jnp.asarray(logp), jnp.asarray(lengths), beam_width=W
    )
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i in range(B):
        assert list(toks[i, : lens[i]]) == host_exact[i], f"row {i}"


def test_device_beam_matches_exact_host_small_beam_wide_vocab():
    """W=4 << K=31 with near-peaked emissions — heavy pruning plus
    merge-sensitive blank ties."""
    rng = np.random.default_rng(4)
    B, T, K, W = 3, 18, 31, 4
    ids = rng.integers(0, K, size=(B, T))
    logits = rng.normal(size=(B, T, K)).astype(np.float32)
    for b in range(B):
        logits[b, np.arange(T), ids[b]] += 3.0
    logits[:, ::4, 0] += 2.8  # blank nearly ties the peak
    logp = _log_softmax(logits)
    lengths = np.full((B,), T, np.int32)
    host_exact = beam_ctc_decode(
        logp, lengths, beam_width=W, frame_candidates=None
    )
    toks, lens = beam_ctc_decode_device(
        jnp.asarray(logp), jnp.asarray(lengths), beam_width=W
    )
    toks, lens = np.asarray(toks), np.asarray(lens)
    for b in range(B):
        assert list(toks[b, : lens[b]]) == host_exact[b], f"row {b}"


def test_device_beam_zero_length_row():
    logp = _log_softmax(np.zeros((2, 6, 4), np.float32))
    lengths = np.array([6, 0], np.int32)
    toks, lens = beam_ctc_decode_device(jnp.asarray(logp), jnp.asarray(lengths),
                                        beam_width=4)
    assert int(lens[1]) == 0
    assert np.all(np.asarray(toks)[1] == -1)
