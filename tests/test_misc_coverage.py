"""Coverage for smaller host-side components: sentence-layer TextGrid
surgery, cyclic LR schedule, local tracker, beam-decode eval path, and the
latent-RNN synthesis wrapper."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sentence_layer_surgery():
    from artspeech_tpu.data.sentence_layer import (
        make_sentence_layers,
        merge_same_intervals,
        split_long_silences,
    )
    from artspeech_tpu.data.textgrid import Interval, IntervalTier, TextGrid

    words = IntervalTier(
        name="WordTier",
        intervals=[
            Interval(0.0, 0.2, "#"),
            Interval(0.2, 0.5, "bonjour"),
            Interval(0.5, 0.6, "#"),
            Interval(0.6, 0.7, "#"),  # merged with previous
            Interval(0.7, 2.5, "#"),  # long silence (1.8s merged -> split)
            Interval(2.5, 2.9, "merci"),
            Interval(2.9, 3.0, "#"),
        ],
    )
    phones = IntervalTier(
        name="PhonTier",
        intervals=[
            Interval(0.0, 0.2, "#"),
            Interval(0.2, 0.35, "b"),
            Interval(0.35, 0.5, "u"),
            Interval(0.5, 2.5, "#"),
            Interval(2.5, 2.7, "m"),
            Interval(2.7, 2.9, "i"),
            Interval(2.9, 3.0, "#"),
        ],
    )
    merged = merge_same_intervals(words)
    assert len(merged.intervals) == 5  # three consecutive SILs merged

    split = split_long_silences(merged, 0.6)
    texts = [iv.text for iv in split.intervals]
    assert "" in texts  # EMPTY gap inserted inside the long silence

    grid = make_sentence_layers(TextGrid(tiers=[words, phones]))
    names = grid.get_tier_names()
    assert names == ["LongSentenceTier", "ShortSentenceTier", "WordTier", "PhonTier"]
    short = grid.get_tier_by_name("ShortSentenceTier")
    sentence_texts = [iv.text for iv in short.intervals if iv.text not in ("", "#")]
    assert sentence_texts == ["bonjour", "merci"]
    # intervals stay contiguous
    for tier in grid.tiers:
        for a, b in zip(tier.intervals[:-1], tier.intervals[1:]):
            assert b.start_time == pytest.approx(a.end_time)


def test_cyclic_triangular_schedule():
    from artspeech_tpu.train.recognition_step import cyclic_triangular_schedule

    sched = cyclic_triangular_schedule(base_lr=1e-5, max_lr=1e-3, step_size=10)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(10)) == pytest.approx(1e-3)  # peak at step_size
    assert float(sched(20)) == pytest.approx(1e-5)  # back to base
    assert float(sched(5)) == pytest.approx((1e-5 + 1e-3) / 2, rel=1e-3)


def test_local_tracker(tmp_path):
    from artspeech_tpu.utils.tracking import LocalTracker, make_tracker

    tracker = make_tracker(str(tmp_path / "run"))
    assert isinstance(tracker, LocalTracker)
    tracker.log_params({"lr": 1e-4, "nested": {"a": 1}})
    tracker.log_params({"bs": 8})
    tracker.log_metrics({"loss": 0.5}, step=0)
    tracker.log_metrics({"loss": np.float32(0.25)}, step=1)
    tracker.log_dict({"final": 1.0}, "results.json")
    src = tmp_path / "artifact.txt"
    src.write_text("hello")
    tracker.log_artifact(str(src))

    params = json.loads((tmp_path / "run" / "params.json").read_text())
    assert params["lr"] == 1e-4 and params["bs"] == 8
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 0.25
    assert (tmp_path / "run" / "artifacts" / "artifact.txt").read_text() == "hello"
    assert json.loads((tmp_path / "run" / "artifacts" / "results.json").read_text()) == {
        "final": 1.0
    }


def test_run_recognition_test_beam_path(tmp_path):
    """use_beam=True goes through the in-graph device beam search."""
    import optax

    from artspeech_tpu.core.vocab import build_vocabulary
    from artspeech_tpu.data.recognition import TARGET_CTC, collate_recognition_batch
    from artspeech_tpu.eval.recognition import run_recognition_test
    from artspeech_tpu.models.deepspeech2 import DeepSpeech2
    from artspeech_tpu.train.recognition_step import make_recognition_eval_step
    from artspeech_tpu.train.state import TrainState

    vocab = build_vocabulary(["a", "b"])
    rng = np.random.default_rng(0)
    items = [
        {
            "sentence_name": f"s{i}",
            "vocal_tract": rng.normal(size=(2, 10, 8)).astype(np.float32),
            "vocal_tract_length": 8,
            TARGET_CTC: np.array([2, 3], np.int32),
            f"{TARGET_CTC}_length": 2,
            "voicing": np.zeros(8, np.float32),
        }
        for i in range(2)
    ]
    batch, meta = collate_recognition_batch(items, "vocal_tract", 8, 2)
    model = DeepSpeech2(
        in_channels=2, num_residual_layers=1, num_rnn_layers=1,
        rnn_hidden_size=8, num_classes=len(vocab), num_features=10,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["features"]),
        lengths=jnp.asarray(batch["input_lengths"]),
    )["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())
    eval_step = make_recognition_eval_step(model, "ctc", TARGET_CTC, feature="vocal_tract")
    info = run_recognition_test(
        state, eval_step, [(batch, meta)], TARGET_CTC, vocab,
        outputs_dir=str(tmp_path), use_beam=True, beam_width=4,
    )
    assert np.isfinite(info["loss"])
    assert info["edit_distance"] >= 0.0


def test_latent_rnn_synthesis_forward():
    from artspeech_tpu.models.autoencoder import (
        MultiDecoder,
        latent_size_of,
        normalize_indices_dict,
    )
    from artspeech_tpu.models.latent_rnn import (
        PrincipalComponentsArtSpeech,
        make_latent_rnn_synthesis_forward,
    )

    indices = {"tongue": 2, "upper-lip": 2}
    d = normalize_indices_dict(indices)
    latent = latent_size_of(d)
    n_samples = 10
    rnn = PrincipalComponentsArtSpeech(vocab_size=6, indices_dict=indices, hidden_size=8)
    tokens = jnp.zeros((1, 5), jnp.int32)
    lengths = jnp.full((1,), 5, jnp.int32)
    rnn_params = rnn.init(jax.random.PRNGKey(0), tokens, lengths)["params"]
    dec = MultiDecoder(indices_dict=indices, in_features=2 * n_samples, hidden_features=8)
    dec_params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, latent)))["params"]

    mean = jnp.full((2, 2, n_samples), 5.0)
    std = jnp.full((2, 2, n_samples), 2.0)
    fwd = make_latent_rnn_synthesis_forward(
        rnn, rnn_params, dec, dec_params, mean, std, rescale_factor=2.0
    )
    out = fwd(tokens, lengths)
    assert out.shape == (1, 5, 2, 2, n_samples)
    assert np.isfinite(np.asarray(out)).all()
