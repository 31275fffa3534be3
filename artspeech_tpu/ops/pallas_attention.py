"""Flash decode-attention over merged-lane KV caches as a Pallas TPU kernel.

Serves the KV-cached transformer decode (models/transformer.py
make_fast_generate, the TPU rebuild of the reference's autoregressive
``generate`` loop, transformer/models.py:391-427). The decode stores caches
``(S, hd, G)`` with every batch/head dim merged into the lane axis and
computes attention as broadcast-multiply + axis reductions. In isolation XLA
streams that pattern at ~689 GB/s on v5e — but inside the real ~160-op scan
body the very same score/PV fusions run at ~94 GB/s (measured, op profiler:
8 x 2.0ms fusions per step at B=64/T=128, 84% of the decode). A Pallas kernel
is not subject to XLA's fusion scheduling, so it keeps its isolated rate in
situ; this one runs the whole online-softmax attend (score, causal mask,
softmax, PV) in one Mosaic program:

- grid (g_blocks, s_chunks): the lane axis is block-parallel, the time axis
  sequential with running max/denominator/accumulator in VMEM scratch
  (the standard flash-decoding split, adapted to the merged-lane layout);
- K/V stream through VMEM double-buffered behind the multiply-reduce;
- score/softmax math in f32 regardless of cache dtype (bf16 caches only
  shrink storage/traffic, matching the XLA path's contract).

Inference-only (no custom_vjp): the cached decode never differentiates.
Golden-tested against the XLA attend in tests/test_pallas_attention.py;
off-TPU the kernel runs in interpret mode so the CPU mesh tests cover it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: cache rows per sequential grid step. 32 keeps k+v blocks ~2x2.4MB at the
#: widest production block (g_block=1152) — comfortably double-buffered.
S_CHUNK = 32

#: per-(k,v) cache-prefix size above which the decode's attends dispatch to
#: the flash kernel. Round 3 pinned this at 32MB from an end-to-end sweep
#: ("flash 0.54x at the 21MB B=64 self cache") — but every flash call then
#: paid a hidden prefix-materialization (see flash_decode_attend), which
#: handicapped exactly the small-cache shapes. Re-swept after the fix
#: (round 5, B=64 T=128 bf16 device): dispatching the 5-10MB self caches
#: too takes the decode 298 -> 205ms (40k frames/s); B=4 is unchanged at
#: either threshold. 4MB keeps the truly VMEM-resident shapes (sub-MB
#: thesis-batch self caches) on XLA's fused attend.
HBM_STREAM_BYTES = 4 * 2**20

#: lane-axis block candidates, widest first; the first divisor of G wins so
#: every block is full (no padded-lane garbage entering the online softmax).
_G_BLOCKS = (1536, 1152, 1024, 768, 640, 512, 384, 256, 128)


def supported(p_end: int, hd: int, g: int) -> bool:
    """Shapes the kernel handles with full tiles only: lane-aligned G with a
    block divisor available, sublane-aligned head dim, chunk-divisible live
    prefix (the chunked-prefix scans of make_fast_generate always slice at
    multiples of 32 for bucket lengths), and an SPMD-safe trace context."""
    return (
        p_end % S_CHUNK == 0
        and hd % 8 == 0
        and hd <= S_CHUNK
        and g % 128 == 0
        and any(g % gb == 0 for gb in _G_BLOCKS)
        and _spmd_safe()
    )


def _spmd_safe() -> bool:
    """Same rule as ops/pallas_gru.py: pallas_call under auto-GSPMD with >1
    devices would be replicated with full gathers (jax's abstract eval misses
    auto-mode non-manual axes) — dispatch only single-device or inside a
    manual (shard_map) region. Interpret mode is exempt: there pallas_call
    lowers to plain jax ops, which GSPMD partitions like any other (lets the
    CPU-mesh tests exercise the dispatched path)."""
    if len(jax.devices()) == 1 or _interpret():
        return True
    mesh = jax.sharding.get_abstract_mesh()
    return bool(mesh.shape_tuple) and mesh.are_all_axes_manual


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_kernel(t_ref, k_ref, v_ref, q_ref, o_ref, m_scr, l_scr, acc_scr):
    si = pl.program_id(1)
    n_s = pl.num_programs(1)
    s_chunk = k_ref.shape[0]

    @pl.when(si == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    t = t_ref[0]
    k = k_ref[:].astype(jnp.float32)  # (s_chunk, hd, gb)
    q = q_ref[:].astype(jnp.float32)  # (hd, gb)
    rows = si * s_chunk + jax.lax.broadcasted_iota(jnp.int32, (s_chunk, 1), 0)
    logits = jnp.sum(k * q[None], axis=1)  # (s_chunk, gb)
    logits = jnp.where(rows <= t, logits, -jnp.inf)

    m_prev = m_scr[:]
    m_cur = jnp.max(logits, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # min(.,0) keeps the first chunk's exp(-inf - m) from producing nan
    alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    p = jnp.exp(logits - m_new)
    v = v_ref[:].astype(jnp.float32)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.sum(v * p[:, None, :], axis=0)
    m_scr[:] = m_new

    @pl.when(si == n_s - 1)
    def _():
        o_ref[:] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def flash_decode_attend(cache_k, cache_v, qg, t, p_end):
    """One decode step of causal attention over a merged-lane KV cache.

    Args:
        cache_k, cache_v: (S, hd, G) caches (f32 or bf16); only the first
            ``p_end`` rows are read.
        qg: (hd, G) pre-scaled query in f32.
        t: current timestep (traced scalar); rows > t are masked out.
        p_end: static live-prefix length, a multiple of ``S_CHUNK``.
    Returns:
        (hd, G) f32 attention output — identical (to ~1e-6) to the XLA
        broadcast-multiply attend of make_fast_generate.
    """
    s, hd, g = cache_k.shape
    g_block = next(gb for gb in _G_BLOCKS if g % gb == 0)
    n_s = p_end // S_CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g // g_block, n_s),
        in_specs=[
            pl.BlockSpec((S_CHUNK, hd, g_block), lambda gi, si, t_ref: (si, 0, gi)),
            pl.BlockSpec((S_CHUNK, hd, g_block), lambda gi, si, t_ref: (si, 0, gi)),
            pl.BlockSpec((hd, g_block), lambda gi, si, t_ref: (0, gi)),
        ],
        out_specs=pl.BlockSpec((hd, g_block), lambda gi, si, t_ref: (0, gi)),
        scratch_shapes=[
            pltpu.VMEM((1, g_block), jnp.float32),
            pltpu.VMEM((1, g_block), jnp.float32),
            pltpu.VMEM((hd, g_block), jnp.float32),
        ],
    )
    # The FULL caches are passed; the sequential grid only runs to
    # p_end // S_CHUNK, so the kernel never DMAs a row past the live
    # prefix. (A jax.lax.slice_in_dim(cache, 0, p_end) here — the round-3
    # formulation — forced XLA to MATERIALIZE the prefix before every
    # kernel launch: 9ms x 6 slices per decode step at the B=64 serving
    # shape, 57ms of the 362ms T=128 decode. Round-5 op profile.)
    return pl.pallas_call(
        _flash_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hd, g), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray([t], jnp.int32), cache_k, cache_v, qg)
