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
    """
    d = pairwise_distances(u, v)
    n, m = d.shape[-2], d.shape[-1]
    flat = d.reshape(*d.shape[:-2], n * m)
    arg = jnp.argmin(flat, axis=-1)
    dist = jnp.min(flat, axis=-1)
    return dist, arg // m, arg % m


def mean_p2cp(u, v):
    """Mean point-to-closest-point distance, both directions.

    Args:
        u: (..., N, D); v: (..., M, D).
    Returns:
        (...,) mean P2CP. Equivalent of reference
        phoneme_to_articulation/metrics.py:27-46 (``MeanP2CPDistance``) and
        ``vt_tools.metrics.p2cp_mean``.
    """
    d = pairwise_distances(u, v)
    u2cp = jnp.min(d, axis=-1)
    v2cp = jnp.min(d, axis=-2)
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
