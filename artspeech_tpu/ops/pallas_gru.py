"""Fused GRU time-loop as a Pallas TPU kernel.

Replaces the ``lax.scan`` recurrence of ops/gru.py:_gru_scan (the TPU-native
rebuild of torch ``nn.GRU``, reference encoder_decoder/models.py:111) for
large-batch time-major layers. The scan lowering pays a fixed per-iteration
cost in the XLA ``while`` loop plus carry-formatting copies in and out of the
loop body; this kernel runs the WHOLE time loop inside one Mosaic program:

- the recurrent weights ``w_h``/``b_h`` stay resident in VMEM for all T steps;
- the hidden state lives in a VMEM scratch buffer across grid steps;
- the time axis is chunked onto the grid, so Pallas double-buffers the HBM
  streams (x_proj in, ys out) behind the per-step compute;
- each chunk's entry state is written to a small ``h_bound`` side output so
  the backward kernel can recompute per-step gates (activation recompute is
  cheaper than storing the (T, B, 3H) gate tensor: one extra (B,H)x(H,3H)
  matmul per step vs 2x50MB of HBM traffic at the b256 shape).

The backward pass is a second Pallas kernel walking the chunks in reverse
traversal order, carrying dL/dh in scratch and accumulating dW_h/db_h in the
revisited output block (f32), wired up via ``jax.custom_vjp``.

Numerics match ``_gru_scan`` (torch gate order r,z,n; masked carry freeze) —
golden-tested against scan fwd+grad in tests/test_pallas_gru.py. Off-TPU the
kernels run in interpret mode so the same code path is unit-testable on the
CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: timesteps per grid step. 4 keeps the backward kernel's six advancing
#: blocks (x_proj, ys, h_bound, mask, g, dx_proj) under the ~16MB VMEM
#: budget with double buffering at the b256 f32 shape.
CHUNK = 4


def supported(t: int, b: int, hidden: int, gates: int = 3) -> bool:
    """Shapes the kernel handles without padding: full lane tiles on the
    gate/hidden axes, sublane-aligned batch, chunk-divisible time. The small
    thesis batches (B=12) stay on the fused-direction scan path (ops/gru.py)
    where per-scan fixed cost, not streaming, dominates."""
    return (
        t % CHUNK == 0
        and t >= 2 * CHUNK
        and b % 8 == 0
        and b >= 64
        and hidden % 128 == 0
        and gates * hidden % 128 == 0
        and _spmd_safe()
    )


def _spmd_safe() -> bool:
    """pallas_call is only partitionable under MANUAL mesh axes (shard_map);
    under auto-GSPMD with >1 devices the custom call would be replicated with
    full-batch gathers, silently destroying dp scaling — jax's own abstract
    eval only rejects the explicit-sharding case (pallas_call.py 'NOTE: this
    doesn't catch auto-mode non-manual axes'). Dispatch the kernel only when
    there is one device (the production single-chip step) or the trace is
    already inside a manual region, and leave the multi-device auto-dp path
    on the scan, which GSPMD partitions correctly."""
    if len(jax.devices()) == 1:
        return True
    mesh = jax.sharding.get_abstract_mesh()
    return bool(mesh.shape_tuple) and mesh.are_all_axes_manual


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split(v, hidden):
    return v[:, :hidden], v[:, hidden : 2 * hidden], v[:, 2 * hidden :]


def _gru_fwd_kernel(xp_ref, m_ref, wh_ref, bh_ref, ys_ref, hb_ref, h_scr,
                    *, hidden, reverse):
    """One traversal chunk of the masked GRU recurrence.

    Block shapes: xp (CHUNK, B, 3H), m (CHUNK, B, 1), wh (H, 3H), bh (1, 3H),
    ys (CHUNK, B, H), hb (1, B, H); h_scr (B, H) persists across the grid.
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    hb_ref[0] = h_scr[:]
    wh = wh_ref[:]
    bh = bh_ref[:]

    for p in range(CHUNK):  # traversal order within the chunk
        q = CHUNK - 1 - p if reverse else p  # storage (time) row
        h = h_scr[:]
        # Gate math in f32 on the VPU regardless of input dtype (Mosaic's
        # bf16 logistic lowering is broken, and f32 carries are better
        # numerics anyway); only the MXU matmul runs in the input dtype.
        hg = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        xg = xp_ref[q].astype(jnp.float32)
        hf = h.astype(jnp.float32)
        hr, hz, hn = _split(hg, hidden)
        xr, xz, xn = _split(xg, hidden)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        cand = (1.0 - z) * n + z * hf
        m = m_ref[q].astype(jnp.float32)  # (B, 1)
        h_new = (m * cand + (1.0 - m) * hf).astype(h.dtype)
        ys_ref[q] = h_new
        h_scr[:] = h_new


def _gru_bwd_kernel(xp_ref, m_ref, wh_ref, bh_ref, ys_ref, hb_ref, g_ref,
                    dxp_ref, dwh_ref, dbh_ref, dh_scr, *, hidden, reverse):
    """Reverse-traversal chunk: recompute gates, backprop through the step.

    dwh/dbh use constant-index output blocks as f32 accumulators (revisited
    every grid step, written back once at the end); dh carries across chunks
    in f32 scratch.
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    wh = wh_ref[:]
    bh = bh_ref[:]

    for p in reversed(range(CHUNK)):  # reverse traversal order
        q = CHUNK - 1 - p if reverse else p  # storage (time) row
        if p == 0:
            h_prev = hb_ref[0]
        else:
            q_prev = CHUNK - p if reverse else p - 1
            h_prev = ys_ref[q_prev]
        cdt = xp_ref.dtype  # compute dtype for the MXU matmuls
        xg = xp_ref[q].astype(jnp.float32)
        # Recompute the gates in f32 (see the forward kernel).
        hg = jnp.dot(h_prev, wh, preferred_element_type=jnp.float32) + bh
        hr, hz, hn = _split(hg, hidden)
        xr, xz, xn = _split(xg, hidden)
        rf = jax.nn.sigmoid(xr + hr)
        zf = jax.nn.sigmoid(xz + hz)
        nf = jnp.tanh(xn + rf * hn)

        m = m_ref[q].astype(jnp.float32)  # (B, 1)
        dh_tot = g_ref[q].astype(jnp.float32) + dh_scr[:]
        dcand = m * dh_tot
        dh_prev = (1.0 - m) * dh_tot

        dz = dcand * (h_prev.astype(jnp.float32) - nf)
        dn = dcand * (1.0 - zf)
        dh_prev = dh_prev + dcand * zf

        dn_pre = dn * (1.0 - nf * nf)
        dr = dn_pre * hn
        dhg_n = dn_pre * rf
        dz_pre = dz * zf * (1.0 - zf)
        dr_pre = dr * rf * (1.0 - rf)

        dhg = jnp.concatenate([dr_pre, dz_pre, dhg_n], axis=-1)  # (B,3H) f32
        dhg_c = dhg.astype(cdt)
        # dh_prev += dhg @ wh^T : contract gate axis of both.
        dh_scr[:] = dh_prev + jax.lax.dot_general(
            dhg_c, wh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dwh += h_prev^T @ dhg : contract batch axis of both.
        dwh_ref[:] += jax.lax.dot_general(
            h_prev, dhg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbh_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
        dxp_ref[q] = jnp.concatenate(
            [dr_pre, dz_pre, dn_pre], axis=-1
        ).astype(cdt)


def _make_gru_sequence(reverse):
    """custom_vjp specialization for one (static) traversal direction."""

    @jax.custom_vjp
    def fn(x_proj, w_h, b_h, mask):
        ys, _ = _gru_forward(x_proj, w_h, b_h, mask, reverse)
        return ys

    def fwd(x_proj, w_h, b_h, mask):
        ys, h_bound = _gru_forward(x_proj, w_h, b_h, mask, reverse)
        return ys, (x_proj, w_h, b_h, mask, ys, h_bound)

    fn.defvjp(fwd, functools.partial(_gru_bwd_rule, reverse))
    return fn


def _gru_forward(x_proj, w_h, b_h, mask, reverse):
    t, b, g = x_proj.shape
    hidden = w_h.shape[0]
    chunks = t // CHUNK
    kernel = functools.partial(_gru_fwd_kernel, hidden=hidden, reverse=reverse)

    def chunk_ix(k):
        return ((chunks - 1 - k) if reverse else k, 0, 0)

    ys, h_bound = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, b, g), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, 1), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((chunks, b, hidden), x_proj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), x_proj.dtype)],
        interpret=_interpret(),
    )(x_proj, mask[:, :, None], w_h, b_h.reshape(1, g))
    return ys, h_bound


def _gru_bwd_rule(reverse, residuals, g):
    x_proj, w_h, b_h, mask, ys, h_bound = residuals
    t, b, gdim = x_proj.shape
    hidden = w_h.shape[0]
    chunks = t // CHUNK
    kernel = functools.partial(_gru_bwd_kernel, hidden=hidden, reverse=reverse)

    # Grid step j processes traversal chunk k = chunks-1-j; its storage
    # (time) chunk is k for forward traversal, chunks-1-k for reverse.
    def chunk_ix(j):
        return (j if reverse else chunks - 1 - j, 0, 0)

    def bound_ix(j):
        return (chunks - 1 - j, 0, 0)  # h_bound is stored in traversal order

    dxp, dwh, dbh = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, b, gdim), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, 1), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), bound_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, b, gdim), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gdim), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gdim), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gdim), x_proj.dtype),
            jax.ShapeDtypeStruct((hidden, gdim), jnp.float32),
            jax.ShapeDtypeStruct((1, gdim), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, mask[:, :, None], w_h, b_h.reshape(1, gdim), ys, h_bound, g)
    return (
        dxp,
        dwh.astype(w_h.dtype),
        dbh.reshape(gdim).astype(b_h.dtype),
        jnp.zeros_like(mask),
    )


_GRU_SEQUENCE = {False: _make_gru_sequence(False), True: _make_gru_sequence(True)}


def gru_sequence(x_proj, w_h, b_h, mask, reverse=False):
    """Masked GRU recurrence over hoisted input projections, time-major.

    Args:
        x_proj: (T, B, 3H) — inputs already projected (x @ W_i + b_i).
        w_h: (H, 3H) recurrent weights; b_h: (3H,) recurrent bias.
        mask: (T, B) in x_proj.dtype, 1.0 on valid steps (carry freezes at 0).
        reverse: static — walk time backward (outputs in forward storage
            order), the torch bidirectional reverse direction.
    Returns:
        (T, B, H) hidden states, matching ops/gru.py:_gru_scan exactly.
    """
    return _GRU_SEQUENCE[bool(reverse)](x_proj, w_h, b_h, mask)


# ---------------------------------------------------------------------------
# LSTM: same fused time-loop structure, two carries (h, c), torch gate order
# (i, f, g, o). The backward kernel makes two passes over each chunk: a
# traversal-order pass that rebuilds the per-step entry cell states and gate
# pre-activations into VMEM scratch (one matmul per step), then a
# reverse-order pass that backprops without any recompute matmuls.
# ---------------------------------------------------------------------------


def _lstm_split(v, hidden):
    return (
        v[:, :hidden],
        v[:, hidden : 2 * hidden],
        v[:, 2 * hidden : 3 * hidden],
        v[:, 3 * hidden :],
    )


def _lstm_fwd_kernel(xp_ref, m_ref, wh_ref, bh_ref, ys_ref, hb_ref, cb_ref,
                     h_scr, c_scr, *, hidden, reverse):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hb_ref[0] = h_scr[:]
    cb_ref[0] = c_scr[:]
    wh = wh_ref[:]
    bh = bh_ref[:]

    for p in range(CHUNK):
        q = CHUNK - 1 - p if reverse else p
        h = h_scr[:]
        gates = (
            jnp.dot(h, wh, preferred_element_type=jnp.float32)
            + bh
            + xp_ref[q].astype(jnp.float32)
        )
        gi, gf, gg, go = _lstm_split(gates, hidden)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        cf = c_scr[:].astype(jnp.float32)
        c_new = f * cf + i * g
        h_cand = o * jnp.tanh(c_new)
        m = m_ref[q].astype(jnp.float32)  # (B, 1)
        h_new = (m * h_cand + (1.0 - m) * h.astype(jnp.float32)).astype(h.dtype)
        c_next = (m * c_new + (1.0 - m) * cf).astype(h.dtype)
        ys_ref[q] = h_new
        h_scr[:] = h_new
        c_scr[:] = c_next


def _lstm_bwd_kernel(xp_ref, m_ref, wh_ref, bh_ref, ys_ref, hb_ref, cb_ref,
                     g_ref, dxp_ref, dwh_ref, dbh_ref,
                     dh_scr, dc_scr, ga_scr, cp_scr, *, hidden, reverse):
    """ga_scr (CHUNK, B, 4H) f32 gate pre-activations; cp_scr (CHUNK, B, H)
    f32 per-step ENTRY cell states — both rebuilt in traversal order, then
    consumed by the reverse-order backprop pass."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    wh = wh_ref[:]
    bh = bh_ref[:]
    cdt = xp_ref.dtype

    # Pass 1 (traversal order): rebuild entry cell states + pre-activations.
    c = cb_ref[0].astype(jnp.float32)
    for p in range(CHUNK):
        q = CHUNK - 1 - p if reverse else p
        if p == 0:
            h_prev = hb_ref[0]
        else:
            q_prev = CHUNK - p if reverse else p - 1
            h_prev = ys_ref[q_prev]
        gates = (
            jnp.dot(h_prev, wh, preferred_element_type=jnp.float32)
            + bh
            + xp_ref[q].astype(jnp.float32)
        )
        ga_scr[p] = gates
        cp_scr[p] = c
        gi, gf, gg, go = _lstm_split(gates, hidden)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        c_new = f * c + i * g
        m = m_ref[q].astype(jnp.float32)
        c = m * c_new + (1.0 - m) * c

    # Pass 2 (reverse traversal order): backprop, no recompute matmuls.
    for p in reversed(range(CHUNK)):
        q = CHUNK - 1 - p if reverse else p
        if p == 0:
            h_prev = hb_ref[0]
        else:
            q_prev = CHUNK - p if reverse else p - 1
            h_prev = ys_ref[q_prev]
        gi, gf, gg, go = _lstm_split(ga_scr[p], hidden)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_prev = cp_scr[p]
        c_new = f * c_prev + i * g
        th = jnp.tanh(c_new)

        m = m_ref[q].astype(jnp.float32)
        dh_tot = g_ref[q].astype(jnp.float32) + dh_scr[:]
        dh_cand = m * dh_tot
        dh_prev = (1.0 - m) * dh_tot
        dc_cand = m * dc_scr[:]
        dc_prev = (1.0 - m) * dc_scr[:]

        do = dh_cand * th
        dc_cand = dc_cand + dh_cand * o * (1.0 - th * th)
        df = dc_cand * c_prev
        di = dc_cand * g
        dg = dc_cand * i
        dc_scr[:] = dc_prev + dc_cand * f

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )  # (B, 4H) f32
        dg_c = dgates.astype(cdt)
        dh_scr[:] = dh_prev + jax.lax.dot_general(
            dg_c, wh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwh_ref[:] += jax.lax.dot_general(
            h_prev, dg_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbh_ref[:] += jnp.sum(dgates, axis=0, keepdims=True)
        dxp_ref[q] = dg_c


def _lstm_forward(x_proj, w_h, b_h, mask, reverse):
    t, b, g = x_proj.shape
    hidden = w_h.shape[0]
    chunks = t // CHUNK
    kernel = functools.partial(_lstm_fwd_kernel, hidden=hidden, reverse=reverse)

    def chunk_ix(k):
        return ((chunks - 1 - k) if reverse else k, 0, 0)

    bound_spec = pl.BlockSpec((1, b, hidden), lambda k: (k, 0, 0),
                              memory_space=pltpu.VMEM)
    ys, h_bound, c_bound = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, b, g), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, 1), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
            bound_spec,
            bound_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((chunks, b, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((chunks, b, hidden), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), x_proj.dtype),
            pltpu.VMEM((b, hidden), x_proj.dtype),
        ],
        interpret=_interpret(),
    )(x_proj, mask[:, :, None], w_h, b_h.reshape(1, g))
    return ys, h_bound, c_bound


def _lstm_bwd_rule(reverse, residuals, g):
    x_proj, w_h, b_h, mask, ys, h_bound, c_bound = residuals
    t, b, gdim = x_proj.shape
    hidden = w_h.shape[0]
    chunks = t // CHUNK
    kernel = functools.partial(_lstm_bwd_kernel, hidden=hidden, reverse=reverse)

    def chunk_ix(j):
        return (j if reverse else chunks - 1 - j, 0, 0)

    def bound_ix(j):
        return (chunks - 1 - j, 0, 0)

    bound_spec = pl.BlockSpec((1, b, hidden), bound_ix, memory_space=pltpu.VMEM)
    dxp, dwh, dbh = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, b, gdim), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, 1), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
            bound_spec,
            bound_spec,
            pl.BlockSpec((CHUNK, b, hidden), chunk_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, b, gdim), chunk_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gdim), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gdim), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gdim), x_proj.dtype),
            jax.ShapeDtypeStruct((hidden, gdim), jnp.float32),
            jax.ShapeDtypeStruct((1, gdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((CHUNK, b, gdim), jnp.float32),
            pltpu.VMEM((CHUNK, b, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, mask[:, :, None], w_h, b_h.reshape(1, gdim), ys, h_bound,
      c_bound, g)
    return (
        dxp,
        dwh.astype(w_h.dtype),
        dbh.reshape(gdim).astype(b_h.dtype),
        jnp.zeros_like(mask),
    )


def _make_lstm_sequence(reverse):
    @jax.custom_vjp
    def fn(x_proj, w_h, b_h, mask):
        ys, _, _ = _lstm_forward(x_proj, w_h, b_h, mask, reverse)
        return ys

    def fwd(x_proj, w_h, b_h, mask):
        ys, h_bound, c_bound = _lstm_forward(x_proj, w_h, b_h, mask, reverse)
        return ys, (x_proj, w_h, b_h, mask, ys, h_bound, c_bound)

    fn.defvjp(fwd, functools.partial(_lstm_bwd_rule, reverse))
    return fn


_LSTM_SEQUENCE = {False: _make_lstm_sequence(False), True: _make_lstm_sequence(True)}


def lstm_sequence(x_proj, w_h, b_h, mask, reverse=False):
    """Masked LSTM recurrence over hoisted input projections, time-major:
    (T, B, 4H) -> (T, B, H), matching ops/gru.py:_lstm_scan (torch gate
    order i, f, g, o; masked h/c carry freeze)."""
    return _LSTM_SEQUENCE[bool(reverse)](x_proj, w_h, b_h, mask)
