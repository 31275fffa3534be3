"""Fused causal attention for TRAINING as a Pallas TPU kernel (custom_vjp).

Serves the multi-channel transformer's teacher-forced decoder (the TPU
rebuild of reference phoneme_to_articulation/transformer/models.py:103-162,
the ChannelInteractionsLayer stack): its cross-channel attention scores are
a (B, C, C-1, H, L, L) tensor — ~1.5GB at the serving batch (B=64, C=10,
H=4, L=128) — and the XLA path writes + reads that tensor in the forward
AND stores it for the backward, which is what drives the step to spill HBM
and forces microbatched gradient accumulation (train/step.py accum_steps).

This kernel never materializes scores in HBM:

- operands are (G, L, hd) with G = pairs * B * H merged, pair-major, so a
  per-(c,j)-pair dropout keep mask is addressable by block index and
  consecutive grid steps reuse the same keep block (Pallas skips re-fetch
  when the block index repeats);
- each grid step processes ``gb`` independent groups; per group the FULL
  (L, L) score tile lives only in VMEM/registers (L is a bucket length,
  128/256 — tiny), so there is no online-softmax bookkeeping: plain
  max-sub softmax per tile, exactly the lean_attention math;
- the causal mask is generated in-kernel from iota. Key-padding masking is
  intentionally omitted: under a causal mask every key k <= q of a VALID
  query q is itself valid, and INVALID queries receive zero cotangent from
  the mask-aware loss (losses/articulation.py), so padded keys cannot
  influence any gradient or any output the loss reads — the omission is
  exact, not an approximation (asserted by the padded-batch parity test).
- dropout on the attention probabilities keeps flax semantics (broadcast
  over batch and head dims, per-(c,j) rng): the caller draws one pre-scaled
  keep/keep_prob mask per pair, (Npairs, L, L), and both kernels fold it
  into the P@V contraction — distribution-identical to
  nn.MultiHeadDotProductAttention's broadcast dropout.
- the backward kernel recomputes S and P from Q/K (FLOPs at the hd=16
  MXU-padded rate are ~25x cheaper than streaming the stored probabilities
  back from HBM), then forms dV = P'^T dO, dP = dO V^T, the softmax VJP
  dS = P (dP' - rowsum(dP' P)), dQ = dS K, dK = dS^T Q in VMEM.

Head dim 16 keeps every dot at 16/128 of MXU depth no matter the
implementation (XLA pays the same padding) — the win here is purely the
~5 score-sized HBM round trips per layer the XLA path pays, plus the
~1.5GB/layer live set that forced accumulation.

Off-TPU the kernel runs in interpret mode so the CPU-mesh golden tests
cover the dispatched path.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: groups per grid step. 8 divides every production B*H (B>=2, H=4) and
#: keeps the per-step VMEM footprint ~4.5MB double-buffered at L=128.
G_BLOCK = 8

#: largest bucket length the full-tile formulation is allowed (VMEM bound:
#: the (L, L) f32 score tile per group; 512 -> 1MB/group, still fine).
MAX_L = 512


def supported(g: int, l: int, hd: int, groups_per_pair: int) -> bool:
    """Full-tile shapes only: lane-aligned L, sublane-aligned head dim,
    block-divisible G with blocks that never straddle a (c, j) pair (the
    keep mask is indexed per pair), and an SPMD-safe trace context."""
    if os.environ.get("ARTSPEECH_NO_TRAIN_ATTENTION_KERNEL"):
        return False
    return (
        l % 128 == 0
        and l <= MAX_L
        and hd % 8 == 0
        and g % G_BLOCK == 0
        and groups_per_pair % G_BLOCK == 0
        and _spmd_safe()
    )


def _spmd_safe() -> bool:
    """Same rule as ops/pallas_gru.py: pallas_call under auto-GSPMD with >1
    devices would be replicated — dispatch only single-device or inside a
    manual (shard_map) region. Interpret mode is exempt (lowers to jax ops
    GSPMD can partition)."""
    if len(jax.devices()) == 1 or _interpret():
        return True
    mesh = jax.sharding.get_abstract_mesh()
    return bool(mesh.shape_tuple) and mesh.are_all_axes_manual


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _causal_bias(l: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    return jnp.where(cols <= rows, 0.0, -jnp.inf).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, keep_ref, o_ref):
    l = q_ref.shape[1]
    bias = _causal_bias(l)
    keep = keep_ref[0]  # (L, L) pre-scaled keep/keep_prob (ones if determ.)

    def body(i, _):
        q = q_ref[i].astype(jnp.float32)  # (L, hd), pre-scaled by 1/sqrt(hd)
        k = k_ref[i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias  # (L, L)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / z) * keep
        v = v_ref[i].astype(jnp.float32)
        o_ref[i] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, q_ref.shape[0], body, 0, unroll=True)


def _bwd_kernel(q_ref, k_ref, v_ref, keep_ref, do_ref, dq_ref, dk_ref, dv_ref):
    l = q_ref.shape[1]
    bias = _causal_bias(l)
    keep = keep_ref[0]

    def body(i, _):
        q = q_ref[i].astype(jnp.float32)
        k = k_ref[i].astype(jnp.float32)
        v = v_ref[i].astype(jnp.float32)
        do = do_ref[i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        p = e / z  # pre-dropout probabilities
        pk = p * keep  # the matrix actually contracted with V in the fwd
        # dV = (P*keep)^T @ dO
        dv_ref[i] = jax.lax.dot_general(
            pk, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dPk = dO @ V^T ; chain through the keep fold
        dpk = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = dpk * keep
        # softmax VJP: dS = P * (dP - sum(dP * P, -1))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[i] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[i] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, q_ref.shape[0], body, 0, unroll=True)


def _group_specs(g, l, hd, n_pairs, blocks_per_pair):
    gspec = pl.BlockSpec((G_BLOCK, l, hd), lambda gi: (gi, 0, 0))
    kspec = pl.BlockSpec((1, l, l), lambda gi: (gi // blocks_per_pair, 0, 0))
    return gspec, kspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_causal_attend(q, k, v, keep, n_pairs: int):
    """Causal attention over merged groups, scores VMEM-only.

    Args:
        q: (G, L, hd) queries PRE-SCALED by 1/sqrt(hd); G is pair-major
            (pairs x batch x heads) so ``keep`` broadcasts per pair.
        k, v: (G, L, hd).
        keep: (n_pairs, L, L) pre-scaled dropout keep mask (keep/keep_prob;
            all-ones when deterministic). Non-differentiable.
        n_pairs: static pair count; G % n_pairs == 0.
    Returns:
        (G, L, hd) f32 attention outputs — softmax(q k^T + causal) keep @ v,
        identical (to reassociation) to lean_attention's math.
    """
    return _fused_fwd_impl(q, k, v, keep, n_pairs)


def _fused_fwd_impl(q, k, v, keep, n_pairs):
    g, l, hd = q.shape
    blocks_per_pair = (g // n_pairs) // G_BLOCK
    gspec, kspec = _group_specs(g, l, hd, n_pairs, blocks_per_pair)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(g // G_BLOCK,),
        in_specs=[gspec, gspec, gspec, kspec],
        out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct((g, l, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(q, k, v, keep)


def _fused_fwd(q, k, v, keep, n_pairs):
    out = _fused_fwd_impl(q, k, v, keep, n_pairs)
    return out, (q, k, v, keep)


def _fused_bwd(n_pairs, res, do):
    q, k, v, keep = res
    g, l, hd = q.shape
    blocks_per_pair = (g // n_pairs) // G_BLOCK
    gspec, kspec = _group_specs(g, l, hd, n_pairs, blocks_per_pair)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(g // G_BLOCK,),
        in_specs=[gspec, gspec, gspec, kspec, gspec],
        out_specs=(gspec, gspec, gspec),
        out_shape=(
            jax.ShapeDtypeStruct((g, l, hd), q.dtype),
            jax.ShapeDtypeStruct((g, l, hd), k.dtype),
            jax.ShapeDtypeStruct((g, l, hd), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(q, k, v, keep, do.astype(jnp.float32))
    return dq, dk, dv, jnp.zeros_like(keep)


fused_causal_attend.defvjp(_fused_fwd, _fused_bwd)
