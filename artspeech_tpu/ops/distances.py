"""Batched contour distance primitives.

TPU-native equivalents of the reference distance machinery
(phoneme_to_articulation/metrics.py:5-46, metrics.py:9-68, vt_tools.metrics).
Everything is shape-polymorphic over leading batch dimensions and jit-safe:
the hot path is one fused broadcast-subtract / square / reduce, which XLA maps
onto the VPU, and the point counts (50) are small enough that the whole
(B, T, Nart, 50, 50) distance tensor lives comfortably in VMEM tiles.
"""

import jax.numpy as jnp


def pairwise_distances(u, v):
    """Euclidean distance matrix between point sets.

    Args:
        u: (..., N, D) points.
        v: (..., M, D) points.
    Returns:
        (..., N, M) distances. Equivalent of ``torch.cdist`` /
        ``vt_tools.metrics.distance_matrix``.
    """
    diff = u[..., :, None, :] - v[..., None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def min_distance(u, v):
    """Minimum pairwise distance and its argmin pair.

    Args:
        u: (..., N, D); v: (..., M, D).
    Returns:
        (dist, idx_u, idx_v): scalars per batch element. Batched, device-side
        equivalent of reference tract_variables.py:23-35 (which used ``.item()``
        host syncs per frame).

    The min/argmin run over SQUARED distances (sqrt is monotone, so the
    result is identical — correctly-rounded sqrt preserves ordering and ties)
    and only the winning entry is square-rooted: one transcendental per batch
    element instead of N*M.
    """
    sq = _sq_dists_elementwise(u, v)
    n, m = sq.shape[-2], sq.shape[-1]
    flat = sq.reshape(*sq.shape[:-2], n * m)
    arg = jnp.argmin(flat, axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.min(flat, axis=-1), 0.0))
    return dist, arg // m, arg % m


def _sq_dists_comps(u_comps, v_comps):
    """(..., N, M) squared distances from per-coordinate (..., N)/(..., M)
    component arrays, with the coordinate sum unrolled.

    The coordinate sum must NOT be a reduce op: XLA's TPU fusion cannot chain
    reduce-into-reduce, so ``min(sum(diff**2, -1), -1)`` materializes the full
    (..., N, M) tensor to HBM between the two reductions (measured: 3.3GB
    written + read = ~10ms at the B=256 train-step shape). With the per-axis
    terms written out elementwise, the min is the only reduce and the whole
    pipeline runs as one loop fusion with nothing materialized.
    """
    sq = None
    for uc, vc in zip(u_comps, v_comps):
        diff = uc[..., :, None] - vc[..., None, :]
        term = diff * diff
        sq = term if sq is None else sq + term
    return sq


def _point_major_comps(u):
    """(..., N, D) -> D-tuple of (..., N) coordinate arrays."""
    return tuple(u[..., k] for k in range(u.shape[-1]))


def _sq_dists_elementwise(u, v):
    """(..., N, M) squared distances for point-major (..., N, D) inputs."""
    return _sq_dists_comps(_point_major_comps(u), _point_major_comps(v))


def _directed_min_sq(u, v):
    """(..., N) min_j |u_i - v_j|^2 — one fused broadcast-subtract/reduce.

    Deliberately re-derives the pairwise tensor per direction: when both
    axis-mins read one shared (..., N, M) intermediate, XLA materializes it
    to HBM between fusions. With a single consumer per direction the whole
    tensor stays in registers/VMEM inside one loop fusion.
    """
    return jnp.min(_sq_dists_elementwise(u, v), axis=-1)


def mean_p2cp(u, v):
    """Mean point-to-closest-point distance, both directions.

    Args:
        u: (..., N, D); v: (..., M, D).
    Returns:
        (...,) mean P2CP. Equivalent of reference
        phoneme_to_articulation/metrics.py:27-46 (``MeanP2CPDistance``) and
        ``vt_tools.metrics.p2cp_mean``.

    Bit-identical to min-then-sqrt over a full distance matrix, but the min
    runs on squared distances (sqrt is monotone) so only the N + M winners
    pay a sqrt, and each direction fuses on its own (see _directed_min_sq).
    """
    u2cp = jnp.sqrt(jnp.maximum(_directed_min_sq(u, v), 0.0))
    v2cp = jnp.sqrt(jnp.maximum(_directed_min_sq(v, u), 0.0))
    return (jnp.mean(u2cp, axis=-1) + jnp.mean(v2cp, axis=-1)) / 2.0


def min_pairwise_distance_channel_major(u, v):
    """(...,) min_{i,j} |u_i - v_j| for channel-major (..., D, N)/(..., D, M)
    contours: one fused broadcast-subtract + a single two-axis min reduce,
    transpose-free, with sqrt applied only to the winner (see mean_p2cp)."""
    d = u.shape[-2]
    uc = tuple(u[..., k, :] for k in range(d))
    vc = tuple(v[..., k, :] for k in range(d))
    sq = jnp.min(_sq_dists_comps(uc, vc), axis=(-2, -1))
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def mean_p2cp_channel_major(u, v):
    """mean_p2cp for channel-major (..., D, N) contours — the model-tensor
    layout (B, T, Nart, 2, n_samples).

    Numerically identical to ``mean_p2cp(swapaxes(u, -1, -2),
    swapaxes(v, -1, -2))`` but transpose-free: coordinates are sliced off the
    channel axis, which is contiguous in this layout, so no relayout copy is
    emitted (the swapaxes form cost ~0.9ms of copies at the B=256 train-step
    shape).
    """
    d = u.shape[-2]
    uc = tuple(u[..., k, :] for k in range(d))
    vc = tuple(v[..., k, :] for k in range(d))
    u2cp = jnp.sqrt(jnp.maximum(jnp.min(_sq_dists_comps(uc, vc), axis=-1), 0.0))
    v2cp = jnp.sqrt(jnp.maximum(jnp.min(_sq_dists_comps(vc, uc), axis=-1), 0.0))
    return (jnp.mean(u2cp, axis=-1) + jnp.mean(v2cp, axis=-1)) / 2.0


def euclidean_distance(outputs, targets):
    """Per-sample-point Euclidean distance between contour tensors.

    Args:
        outputs, targets: (..., 2, D) with x and y stacked on axis -2.
    Returns:
        (..., D) distances (no reduction). Equivalent of reference
        phoneme_to_articulation/metrics.py:5-24 with ``reduction="none"``.
    """
    diff = outputs - targets
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-2), 0.0))


def pearson_correlation(outputs, targets, mask=None, axis=1, eps=1e-8):
    """Pearson correlation along an axis (time), optionally masked.

    Equivalent of reference metrics.py:9-35 — with the intended semantics:
    the target deviations are taken around the *target* mean (the reference
    subtracts the output mean from the targets at metrics.py:22, a bug we do
    not replicate).

    Args:
        outputs, targets: arrays with a time axis.
        mask: optional boolean same-broadcast mask; False entries are ignored.
        axis: the time axis.
    """
    if mask is not None:
        w = mask.astype(outputs.dtype)
        denom = jnp.maximum(jnp.sum(w, axis=axis, keepdims=True), 1.0)
        mean_o = jnp.sum(outputs * w, axis=axis, keepdims=True) / denom
        mean_t = jnp.sum(targets * w, axis=axis, keepdims=True) / denom
        vo = (outputs - mean_o) * w
        vt = (targets - mean_t) * w
    else:
        vo = outputs - jnp.mean(outputs, axis=axis, keepdims=True)
        vt = targets - jnp.mean(targets, axis=axis, keepdims=True)
    num = jnp.sum(vo * vt, axis=axis)
    den = jnp.sqrt(jnp.sum(vo * vo, axis=axis) * jnp.sum(vt * vt, axis=axis))
    return num / jnp.maximum(den, eps)


#: XLA P2CP formula (single definition; the Pallas custom-VJP backward and
#: the auto dispatch both reuse mean_p2cp above).
_mean_p2cp_xla = mean_p2cp


import jax as _jax


@_jax.custom_vjp
def _mean_p2cp_fast(u, v):
    from artspeech_tpu.ops.pallas_kernels import mean_p2cp_pallas

    return mean_p2cp_pallas(u, v)


def _mean_p2cp_fast_fwd(u, v):
    return _mean_p2cp_fast(u, v), (u, v)


def _mean_p2cp_fast_bwd(res, g):
    u, v = res
    _, vjp = _jax.vjp(_mean_p2cp_xla, u, v)
    return vjp(g)


_mean_p2cp_fast.defvjp(_mean_p2cp_fast_fwd, _mean_p2cp_fast_bwd)


def mean_p2cp_auto(u, v):
    """mean_p2cp — XLA formula on every backend.

    History: round-1 timings showed the Pallas kernel "never slower, up to
    3.8x faster", but those numbers were dispatch-latency artifacts — under
    the axon tunnel ``block_until_ready`` does not wait for the device (see
    benchmarks/timing.py). Honest dependency-chained timing on v5e shows XLA
    ahead at every pipeline shape: 0.79ms vs 1.99ms at (16,128,11,50,2),
    2.17 vs 2.53 at (12,256,10,50,2), 0.11 vs 0.65 at (1,64,11,50,2)
    (benchmarks/BENCH_DETAILS.md). The fused broadcast-subtract/reduce maps
    straight onto the VPU and XLA fuses it into the surrounding graph,
    which the Pallas call boundary prevents. The kernel is kept in
    ops/pallas_kernels.py as a measured reference, like the fused GRU."""
    return _mean_p2cp_xla(u, v)
