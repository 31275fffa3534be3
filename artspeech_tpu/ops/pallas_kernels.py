"""Pallas TPU kernels for the geometry hot paths.

The single hottest op in the framework is the batched point-set distance
reduction behind P2CP (losses, valid metric, eval) and min-distance (tract
variables, critical loss): a (R, N, M) pairwise-distance tensor reduced to
per-row scalars, with R = B*T*Nart rows of N=M=50-point contours.

The XLA lowering materializes the broadcast-subtract tensor between fusions;
these kernels keep the whole (tile, N, M) working set in VMEM and emit only
the per-row reductions to HBM. Rows are tiled along the grid; N/M stay whole
(50 points -> padded lanes) inside a block.

Kernels fall back to ``interpret=True`` off-TPU so the same code path is
unit-testable on the CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_ROW_TILE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _p2cp_kernel(ux_ref, uy_ref, vx_ref, vy_ref, out_ref):
    """Rows tile: mean bidirectional point-to-closest-point distance."""
    dx = ux_ref[:][:, :, None] - vx_ref[:][:, None, :]  # (TR, N, M)
    dy = uy_ref[:][:, :, None] - vy_ref[:][:, None, :]
    d = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 0.0))
    u2cp = jnp.mean(jnp.min(d, axis=2), axis=1)  # (TR,)
    v2cp = jnp.mean(jnp.min(d, axis=1), axis=1)
    out_ref[:] = ((u2cp + v2cp) * 0.5)[:, None]


def _min_dist_kernel(ux_ref, uy_ref, vx_ref, vy_ref, out_ref):
    """Rows tile: minimum pairwise distance and flat argmin.

    Two-stage reduction (per-row min over j, then over i) — a flat
    (TR, N*M) reshape of a tiled vector is not supported by Mosaic.
    """
    dx = ux_ref[:][:, :, None] - vx_ref[:][:, None, :]
    dy = uy_ref[:][:, :, None] - vy_ref[:][:, None, :]
    sq = dx * dx + dy * dy  # (TR, N, M)
    tr, n, m = sq.shape
    row_min = jnp.min(sq, axis=2)  # (TR, N)
    row_arg = jnp.argmin(sq, axis=2)  # (TR, N)
    i = jnp.argmin(row_min, axis=1)  # (TR,)
    best = jnp.min(row_min, axis=1)
    # j = row_arg[r, i[r]] via one-hot select (gather doesn't lower in Mosaic).
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    onehot = cols == i[:, None]
    j = jnp.sum(jnp.where(onehot, row_arg, 0), axis=1)
    out_ref[:, 0] = jnp.sqrt(jnp.maximum(best, 0.0))
    out_ref[:, 1] = (i * m + j).astype(out_ref.dtype)


def _rows_call(kernel, out_cols, ux, uy, vx, vy, row_tile):
    r, n = ux.shape
    m = vx.shape[1]
    tiles = pl.cdiv(r, row_tile)
    pad = tiles * row_tile - r
    if pad:
        ux = jnp.pad(ux, ((0, pad), (0, 0)))
        uy = jnp.pad(uy, ((0, pad), (0, 0)))
        vx = jnp.pad(vx, ((0, pad), (0, 0)), constant_values=1e9)
        vy = jnp.pad(vy, ((0, pad), (0, 0)), constant_values=1e9)
    in_spec = lambda cols: pl.BlockSpec(
        (row_tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tiles * row_tile, out_cols), jnp.float32),
        grid=(tiles,),
        in_specs=[in_spec(n), in_spec(n), in_spec(m), in_spec(m)],
        out_specs=pl.BlockSpec(
            (row_tile, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ux, uy, vx, vy)
    return out[:r]


def mean_p2cp_pallas(u, v, row_tile: int = DEFAULT_ROW_TILE):
    """Fused mean-P2CP over leading batch dims.

    Args:
        u: (..., N, 2) points; v: (..., M, 2) points.
    Returns:
        (...,) mean bidirectional P2CP — same contract as
        artspeech_tpu.ops.distances.mean_p2cp.
    """
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    batch_shape = u.shape[:-2]
    n, m = u.shape[-2], v.shape[-2]
    ur = u.reshape(-1, n, 2)
    vr = v.reshape(-1, m, 2)
    out = _rows_call(
        _p2cp_kernel,
        1,
        ur[..., 0],
        ur[..., 1],
        vr[..., 0],
        vr[..., 1],
        row_tile,
    )
    return out[:, 0].reshape(batch_shape)


def min_distance_pallas(u, v, row_tile: int = DEFAULT_ROW_TILE):
    """Fused min pairwise distance + argmin pair over leading batch dims.

    Same contract as artspeech_tpu.ops.distances.min_distance:
    returns (dist, idx_u, idx_v).
    """
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    batch_shape = u.shape[:-2]
    n, m = u.shape[-2], v.shape[-2]
    ur = u.reshape(-1, n, 2)
    vr = v.reshape(-1, m, 2)
    out = _rows_call(
        _min_dist_kernel,
        2,
        ur[..., 0],
        ur[..., 1],
        vr[..., 0],
        vr[..., 1],
        row_tile,
    )
    dist = out[:, 0].reshape(batch_shape)
    arg = out[:, 1].astype(jnp.int32).reshape(batch_shape)
    return dist, arg // m, arg % m


def _gru_seq_kernel(xproj_ref, wh_ref, bh_ref, mask_ref, out_ref):
    """Whole GRU recurrence for one batch tile, weights resident in VMEM.

    xproj: (TB, T, 3H) precomputed input projections; wh: (H, 3H);
    bh: (1, 3H); mask: (TB, T, 1) float (1=valid) — the time axis must sit
    on a sublane dimension (dynamic lane indexing is not lowerable).
    Writes (TB, T, H).
    """
    tb, t_len, three_h = xproj_ref.shape
    h_dim = three_h // 3
    wh = wh_ref[:]
    bh = bh_ref[0]

    def step(t, h):
        xg = xproj_ref[:, t, :]  # (TB, 3H)
        hg = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        r = jax.nn.sigmoid(xg[:, :h_dim] + hg[:, :h_dim])
        z = jax.nn.sigmoid(xg[:, h_dim : 2 * h_dim] + hg[:, h_dim : 2 * h_dim])
        n = jnp.tanh(xg[:, 2 * h_dim :] + r * hg[:, 2 * h_dim :])
        h_new = (1.0 - z) * n + z * h
        m = mask_ref[:, t, :]  # (TB, 1)
        h_new = m * h_new + (1.0 - m) * h
        out_ref[:, t, :] = h_new
        return h_new

    jax.lax.fori_loop(0, t_len, step, jnp.zeros((tb, h_dim), jnp.float32))


def gru_sequence_pallas(x_proj, w_h, b_h, mask, batch_tile: int = 16):
    """Fused masked GRU recurrence (forward only; exact GRULayer parity).

    Speed-of-light note (v5e, honest dependency-chained timing — see
    benchmarks/timing.py; the round-1 "pipelined" numbers were dispatch
    artifacts): at B=12 T=128 H=128 this kernel runs one direction in
    0.126ms vs 0.117ms for the XLA ``lax.scan`` — parity at the
    sequential-dependency floor, with no gradient. The production GRU path
    therefore stays on the XLA scan (differentiable; both directions fused
    into one scan at small batch — ops/gru.py), and this kernel is kept as
    the measured reference point.

    Args:
        x_proj: (B, T, 3H) hoisted input projections (x @ w_i + b_i).
        w_h: (H, 3H); b_h: (3H,); mask: (B, T) bool.
    Returns:
        (B, T, H) hidden states (torch gate semantics, matching
        artspeech_tpu.ops.gru.GRULayer).
    """
    x_proj = jnp.asarray(x_proj, jnp.float32)
    b, t, three_h = x_proj.shape
    h_dim = three_h // 3
    tiles = pl.cdiv(b, batch_tile)
    pad = tiles * batch_tile - b
    maskf = mask.astype(jnp.float32)[..., None]  # (B, T, 1)
    if pad:
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0)))
        maskf = jnp.pad(maskf, ((0, pad), (0, 0), (0, 0)))
    out = pl.pallas_call(
        _gru_seq_kernel,
        out_shape=jax.ShapeDtypeStruct((tiles * batch_tile, t, h_dim), jnp.float32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((batch_tile, t, three_h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, t, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x_proj, jnp.asarray(w_h, jnp.float32), jnp.asarray(b_h, jnp.float32)[None], maskf)
    return out[:b]
