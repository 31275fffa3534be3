"""End-to-end synthesis throughput benchmark.

Measures frames/sec for the full phoneme -> contour -> B-spline smoothing ->
vocal-tract tube -> semipolar-grid area-function synthesis pipeline as ONE
jitted XLA program on the available accelerator, against a
reference-faithful PyTorch-CPU implementation of the same per-frame work
(the reference is single-device torch with per-frame host geometry:
generate_vocal_tract_shape_v2.py:365-439 + scripts/shape_to_air_column.py +
area_function.py:124-223 — scipy splines, wall chaining, per-grid-line
intersections, even resampling; shapely/numba replaced by equivalent-or-
faster numpy).

``vs_baseline`` is computed against the GPU-EXTRAPOLATED reference bound:
the reference's network forward would move to GPU, but its per-frame
geometry is host code — so an idealized PyTorch-GPU reference is bounded by
geometry-only CPU throughput (model time -> 0). That bound is what the
value is divided by (a torch forward still runs once to produce the
baseline's input frames, faithful to the reference pipeline).

Measurement protocol (round 3 — pins the ratio, which previously swung
2.4x run-to-run with host load): the baseline runs single-threaded with
pinned BLAS/OMP thread counts (the reference's per-frame geometry is
single-thread host Python), and both sides are measured INTERLEAVED k
times — TPU chained slope, then baseline geometry, repeated — so a host
load spike hits both sides of a ratio sample rather than one. The TPU
side takes best-of-k; the baseline takes the PER-FRAME minimum across
rounds (contention only ever adds time, and a spike would have to hit
the same frame in all k rounds to survive, where best-of-round needed an
entire spike-free round).

Both published bands use the SAME estimator family as the headline
(round 4 — previously the band divided by per-round mean baselines while
the headline divided by the per-frame-min baseline, so the headline could
sit outside its own band): ``vs_baseline_band`` is every TPU sample
divided by the one pinned per-frame-min baseline — the headline is its
max by construction, so it always lies inside — and
``contention_band`` is the per-round ratio (sample i over round i's mean
baseline), the run's visible host-contention level.

Prints one JSON line:
  {"metric": "synthesis_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N, "vs_baseline_band": [lo, hi],
   "contention_band": [lo, hi]}
"""

import json
import os
import sys
import time

# Pin BLAS/OMP pools BEFORE numpy/torch import: the baseline must be the
# reference's single-thread host-geometry cost, not a load-dependent pool.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np

BATCH = 16
SEQ = 128
N_ART = 11
N_SAMPLES = 50
VOCAB = 64
FRAMES = BATCH * SEQ
WALL_POINTS = 100
AREA_SAMPLES = 200


def _semipolar_grid_np():
    """The fixed Maeda-style grid both pipelines intersect against."""
    from artspeech_tpu.geometry.grid import build_semipolar_grid

    return np.asarray(
        build_semipolar_grid(
            center=(0.5, 0.5),
            theta_rad=np.deg2rad(30.0),
            omega_rad=np.deg2rad(-30.0),
            linear_step=0.05,
            polar_step_rad=np.deg2rad(5.0),
        ),
        dtype=np.float32,
    )


def bench_tpu(grid):
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
    grid_j = jnp.asarray(grid)

    @jax.jit
    def synthesize(params, tokens, lengths):
        contours = model.apply({"params": params}, tokens, lengths)
        smooth = regularize_bsplines(jnp.swapaxes(contours, -1, -2))
        smooth = jnp.swapaxes(smooth, -1, -2)
        flat = smooth.reshape(-1, N_ART, 2, N_SAMPLES)
        internal, external = generate_vocal_tract_tube_batch(
            flat, arts, wall_points=WALL_POINTS
        )
        area = jax.vmap(
            lambda i, e: tube_area_function(
                i, e, semipolar_grid=grid_j, n_samples=AREA_SAMPLES
            )
        )(internal, external)
        return contours, internal, external, area

    # Dependency-chained timing with a two-point slope: through the axon TPU
    # tunnel ``block_until_ready`` does NOT wait for device completion (only a
    # host fetch synchronizes), so each iteration's input must data-depend on
    # the previous output and the fixed fetch cost is removed by the slope
    # (benchmarks/timing.py). The chain runs INSIDE one jitted fori_loop —
    # zero per-iteration host dispatch, so a loaded host cannot inflate the
    # slope (an eager per-iteration chain measured up to 1.4x slow under
    # load). The anchor sums the full area tensor so no per-frame work is
    # dead-code-eliminated inside the loop.
    @jax.jit
    def chain_n(params, tokens, lengths, n):
        def body(_, carry):
            toks, __ = carry
            out = synthesize(params, toks, lengths)  # nested jit: inlined
            anchor = jnp.sum(out[-1]) * 1e-9
            toks_next = toks + (anchor * 0).astype(toks.dtype)
            return toks_next, anchor

        return jax.lax.fori_loop(0, n, body, (tokens, jnp.zeros(())))

    out = synthesize(params, tokens, lengths)  # compile + sanity
    assert all(bool(jnp.isfinite(x).all()) for x in out)

    def run(n):
        t0 = time.perf_counter()
        c = chain_n(params, tokens, lengths, n)
        float(c[1])  # host fetch forces completion of the whole chain
        return time.perf_counter() - t0

    run(2)  # compile (n is a traced loop bound: one program) + warm

    def measure_once(n1=4, n2=24):
        return FRAMES / ((run(n2) - run(n1)) / (n2 - n1))

    return measure_once


# ---------------------------------------------------------------------------
# Reference-faithful torch-CPU baseline
# ---------------------------------------------------------------------------

def _baseline_orders():
    from artspeech_tpu.core import constants as C
    from artspeech_tpu.geometry.tube import EXTERNAL_WALL_ORDER, INTERNAL_WALL_ORDER

    arts = sorted(
        [
            C.TONGUE, C.UPPER_LIP, C.LOWER_LIP, C.UPPER_INCISOR,
            C.LOWER_INCISOR, C.PHARYNX, C.SOFT_PALATE_MIDLINE, C.EPIGLOTTIS,
            C.ARYTENOID_CARTILAGE, C.THYROID_CARTILAGE, C.VOCAL_FOLDS,
        ]
    )
    internal = [arts.index(a) for a in INTERNAL_WALL_ORDER]
    external = [arts.index(a) for a in EXTERNAL_WALL_ORDER]
    return internal, external


def _regularize_scipy(contour):
    """Reference-style B-spline smoothing (vt_tools regularize_Bsplines is
    a scipy spline fit per dumped contour, phoneme_to_articulation/
    __init__.py:186)."""
    from scipy.interpolate import splev, splprep

    tck, _ = splprep([contour[:, 0], contour[:, 1]], k=3, s=1e-4)
    u = np.linspace(0.0, 1.0, len(contour))
    x, y = splev(u, tck)
    return np.stack([x, y], axis=1)


def _chain_np(contours):
    first = contours[0]
    if len(contours) > 1:
        nxt = contours[1]
        d_end = min(
            np.sum((nxt[0] - first[-1]) ** 2), np.sum((nxt[-1] - first[-1]) ** 2)
        )
        d_start = min(
            np.sum((nxt[0] - first[0]) ** 2), np.sum((nxt[-1] - first[0]) ** 2)
        )
        if d_start < d_end:
            first = first[::-1]
    pieces = [first]
    end = first[-1]
    for c in contours[1:]:
        if np.sum((c[-1] - end) ** 2) < np.sum((c[0] - end) ** 2):
            c = c[::-1]
        pieces.append(c)
        end = c[-1]
    return np.concatenate(pieces, axis=0)


def _arclength_resample_np(points, n_out):
    seg = np.linalg.norm(np.diff(points, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    s_new = np.linspace(0.0, s[-1], n_out)
    return np.stack(
        [np.interp(s_new, s, points[:, 0]), np.interp(s_new, s, points[:, 1])],
        axis=1,
    )


def _intersect_line_wall_np(p0, p1, wall):
    """Crossing points of one grid line with a wall polyline (the work
    shapely's line.intersection does per grid line,
    reference area_function.py:175-223)."""
    q0 = wall[:-1]
    e = wall[1:] - wall[:-1]
    d = p1 - p0
    rel = q0 - p0
    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
    safe = np.where(np.abs(denom) > 1e-12, denom, 1.0)
    t = (rel[:, 0] * e[:, 1] - rel[:, 1] * e[:, 0]) / safe
    u = (rel[:, 0] * d[1] - rel[:, 1] * d[0]) / safe
    valid = (np.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    return p0 + t[valid, None] * d


def _geometry_frame_np(frame, internal_order, external_order, grid):
    """The reference's full per-frame geometry on one (Nart, 2, 50) frame."""
    pts = frame.transpose(0, 2, 1)  # (Nart, 50, 2)
    smooth = [_regularize_scipy(c) for c in pts]
    internal = _arclength_resample_np(
        _chain_np([smooth[i] for i in internal_order]), WALL_POINTS
    )
    external = _arclength_resample_np(
        _chain_np([smooth[i] for i in external_order]), WALL_POINTS
    )

    # Per-grid-line wall intersections + nearest pairing.
    sections = []
    for line in grid:
        p0, p1 = line[0], line[-1]
        ci = _intersect_line_wall_np(p0, p1, internal)
        ce = _intersect_line_wall_np(p0, p1, external)
        if len(ci) and len(ce):
            dmat = np.sum((ci[:, None, :] - ce[None, :, :]) ** 2, axis=-1)
            a, b = np.unravel_index(np.argmin(dmat), dmat.shape)
            sections.append((ci[a], ce[b]))
        elif len(ci):
            ends = np.stack([external[0], external[-1]])
            d = np.sum((ci[:, None, :] - ends[None]) ** 2, axis=-1)
            a, b = np.unravel_index(np.argmin(d), d.shape)
            sections.append((ci[a], ends[b]))
        elif len(ce):
            ends = np.stack([internal[0], internal[-1]])
            d = np.sum((ce[:, None, :] - ends[None]) ** 2, axis=-1)
            a, b = np.unravel_index(np.argmin(d), d.shape)
            sections.append((ends[b], ce[a]))

    if len(sections) < 2:
        return None
    iw = np.stack([s[0] for s in sections])
    ew = np.stack([s[1] for s in sections])
    # mid_point + area (reference area_function.py:113-142).
    mid = (iw + ew) / 2.0
    radius = np.linalg.norm(iw - ew, axis=1) / 2.0
    fx = np.pi * radius**2
    dists = np.concatenate([[0.0], np.cumsum(np.linalg.norm(np.diff(mid, axis=0), axis=1))])
    # evenly_spaced_fx (reference :145-159).
    xs = np.linspace(dists[0], dists[-1], AREA_SAMPLES)
    return np.stack([xs, np.interp(xs, dists, fx)])


def bench_torch_baseline(grid, frames_sub=128):
    """Reference-faithful pipeline: torch BiGRU forward + the real per-frame
    host geometry. Returns a measure_geometry closure; geometry-only fps is
    the idealized PyTorch-GPU bound (network time -> 0, geometry stays on
    the host as in the reference)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(1)  # pinned: the reference geometry is 1-thread
    internal_order, external_order = _baseline_orders()

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

    with torch.no_grad():
        out = model(tokens)

    flat = out.reshape(-1, N_ART, 2, N_SAMPLES).numpy().astype(np.float64)
    sub = flat[:frames_sub]

    def measure_geometry():
        """Per-frame geometry times (seconds) over the fixed frame subset.

        Returns the per-frame time vector rather than one fps number so the
        caller can take the PER-FRAME minimum across rounds: a contention
        spike hits different frames in different rounds, so elementwise
        min-over-rounds removes it far more effectively than best-of-round
        (which needs one whole round to be spike-free)."""
        times = np.empty(len(sub))
        n_ok = 0
        for i, frame in enumerate(sub):
            t0 = time.perf_counter()
            res = _geometry_frame_np(frame, internal_order, external_order, grid)
            times[i] = time.perf_counter() - t0
            n_ok += res is not None
        assert n_ok > 0, "baseline geometry produced no valid frames"
        return times

    return measure_geometry


def main(k=5):
    grid = _semipolar_grid_np()
    measure_tpu = bench_tpu(grid)
    try:
        measure_geometry = bench_torch_baseline(grid)
    except Exception:
        measure_geometry = None

    # Interleaved best-of-k: both sides share one loaded core with unknown
    # competing processes, and scheduler contention only ever ADDS time —
    # so the fastest of k interleaved rounds is the estimator of each
    # side's uncontended cost (medians still carried 1.9x spread here).
    # The per-round ratio band is published so the contention level of the
    # run is visible next to the headline.
    tpu_samples, geom_rounds, contention = [], [], []
    for _ in range(k):
        # A TPU sample costs ~0.1s against the baseline round's seconds, and
        # the chained-slope wall time is itself inflated by host dispatch
        # load — sample it on both sides of every baseline round so at least
        # one sample lands in each lull.
        fps_i = measure_tpu()
        tpu_samples.append(fps_i)
        if measure_geometry is not None:
            # A baseline failure mid-round degrades vs_baseline instead of
            # losing the TPU headline (the driver records this JSON line).
            try:
                times_i = measure_geometry()
            except Exception:
                measure_geometry = None
                continue
            geom_rounds.append(times_i)
            contention.append(fps_i * float(np.mean(times_i)))
            tpu_samples.append(measure_tpu())
    fps = float(max(tpu_samples))
    # Per-frame minimum across rounds: each frame's uncontended cost is its
    # fastest observation; a load spike would have to hit the SAME frame in
    # every round to survive (best-of-round needed one spike-free round).
    geom_fps = (
        1.0 / float(np.mean(np.min(np.stack(geom_rounds), axis=0)))
        if geom_rounds
        else None
    )
    result = {
        "metric": "synthesis_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / geom_fps, 3) if geom_fps else None,
    }
    if geom_fps:
        # Same estimator as the headline (each TPU sample over the ONE
        # pinned per-frame-min baseline): vs_baseline == band max, so the
        # headline lies inside its own band by construction. The spread is
        # the TPU-sample (chained-slope) dispersion of this run.
        result["vs_baseline_band"] = [
            round(float(min(tpu_samples)) / geom_fps, 3),
            round(fps / geom_fps, 3),
        ]
    if contention:
        # Per-round ratios against that round's OWN mean baseline: the
        # visible host-contention level of the run (diagnostic, not the
        # headline estimator).
        result["contention_band"] = [
            round(float(min(contention)), 3),
            round(float(max(contention)), 3),
        ]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
