"""End-to-end synthesis throughput benchmark.

Measures frames/sec for the full phoneme -> contour -> B-spline smoothing ->
vocal-tract tube -> area-function synthesis pipeline as ONE jitted XLA program
on the available accelerator, and compares against a reference-style PyTorch
(CPU) implementation of the same pipeline (the reference repo is
single-device torch with per-frame host geometry loops,
generate_vocal_tract_shape_v2.py:365-439, and publishes no numbers of its
own — see BASELINE.md).

Prints one JSON line:
  {"metric": "synthesis_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N}
where vs_baseline = value / torch_cpu_baseline_fps.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 16
SEQ = 128
N_ART = 11
N_SAMPLES = 50
VOCAB = 64
FRAMES = BATCH * SEQ


def bench_tpu():
    import jax

    try:
        from artspeech_tpu.cli.common import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    import jax.numpy as jnp

    from artspeech_tpu.core import constants as C
    from artspeech_tpu.models.artspeech_rnn import ArtSpeech
    from artspeech_tpu.ops.bspline import regularize_bsplines
    from artspeech_tpu.geometry import (
        generate_vocal_tract_tube_batch,
        tube_area_function,
    )

    arts = sorted(
        [
            C.TONGUE, C.UPPER_LIP, C.LOWER_LIP, C.UPPER_INCISOR,
            C.LOWER_INCISOR, C.PHARYNX, C.SOFT_PALATE_MIDLINE, C.EPIGLOTTIS,
            C.ARYTENOID_CARTILAGE, C.THYROID_CARTILAGE, C.VOCAL_FOLDS,
        ]
    )
    model = ArtSpeech(vocab_size=VOCAB, n_articulators=N_ART)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (BATCH, SEQ), 0, VOCAB)
    lengths = jnp.full((BATCH,), SEQ, dtype=jnp.int32)
    params = model.init(rng, tokens, lengths)["params"]

    @jax.jit
    def synthesize(params, tokens, lengths):
        contours = model.apply({"params": params}, tokens, lengths)
        smooth = regularize_bsplines(jnp.swapaxes(contours, -1, -2))
        smooth = jnp.swapaxes(smooth, -1, -2)
        flat = smooth.reshape(-1, N_ART, 2, N_SAMPLES)
        internal, external = generate_vocal_tract_tube_batch(flat, arts)
        area = jax.vmap(lambda i, e: tube_area_function(i, e))(internal, external)
        return contours, internal, external, area

    out = jax.block_until_ready(synthesize(params, tokens, lengths))  # compile
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = synthesize(params, tokens, lengths)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    assert all(bool(jnp.isfinite(x).all()) for x in out)
    return FRAMES * n_iters / dt


def bench_torch_baseline():
    """Reference-style pipeline: torch BiGRU model forward + per-frame host
    geometry (numpy), mirroring the reference's single-device loop."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    class TorchArtSpeech(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(VOCAB, 64)
            self.rnn = nn.GRU(64, 128, num_layers=2, batch_first=True, bidirectional=True)
            self.linear = nn.Linear(256, 128)
            self.heads = nn.ModuleList(
                [
                    nn.Sequential(
                        nn.LayerNorm(128), nn.Linear(128, 256), nn.ReLU(),
                        nn.LayerNorm(256), nn.Linear(256, 256), nn.ReLU(),
                        nn.LayerNorm(256), nn.Linear(256, 2 * N_SAMPLES),
                    )
                    for _ in range(N_ART)
                ]
            )

        def forward(self, x):
            h, _ = self.rnn(self.embed(x))
            h = torch.relu(self.linear(h))
            outs = [head(h).view(*h.shape[:2], 1, 2, N_SAMPLES) for head in self.heads]
            return torch.sigmoid(torch.cat(outs, dim=2))

    model = TorchArtSpeech().eval()
    tokens = torch.randint(0, VOCAB, (BATCH, SEQ))

    def geometry_host(contours):
        # per-frame host loop like reference generate_vocal_tract_shape_v2
        flat = contours.reshape(-1, N_ART, 2, N_SAMPLES).numpy()
        for frame in flat:
            walls = frame.transpose(0, 2, 1).reshape(-1, 2)  # crude chain
            d = np.linalg.norm(np.diff(walls, axis=0), axis=1)
            pos = np.concatenate([[0.0], np.cumsum(d)])
            # resample both walls to 100 pts + area fn
            grid = np.linspace(0, pos[-1], 100)
            xs = np.interp(grid, pos, walls[:, 0])
            ys = np.interp(grid, pos, walls[:, 1])
            r = np.hypot(np.diff(xs), np.diff(ys))
            _ = np.pi * r**2

    n_iters = 3
    with torch.no_grad():
        model(tokens)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = model(tokens)
            geometry_host(out)
        dt = time.perf_counter() - t0
    return FRAMES * n_iters / dt


def main():
    fps = bench_tpu()
    try:
        baseline_fps = bench_torch_baseline()
    except Exception:
        baseline_fps = None
    vs = round(fps / baseline_fps, 3) if baseline_fps else None
    print(
        json.dumps(
            {
                "metric": "synthesis_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
