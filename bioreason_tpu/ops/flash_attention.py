"""Pallas TPU flash attention (forward + backward, custom VJP).

The TPU-native replacement for the reference's flash-attention-2 CUDA
dependency (grpo_trainer.py:220,237). Online-softmax tiling keeps the
[Tq, Tk] score matrix out of HBM: blocks of Q stream against blocks of K/V
held in VMEM, with running (max, sum, acc) scratch carried across the
sequential innermost grid dimension (TPU grids execute in order, so VMEM
scratch persists across the k-block loop).

Layout: q [B,Tq,Hq,D], k/v [B,Tk,Hkv,D] are viewed as [B*H, T, D] with GQA
folded into the kernel's index maps (no materialized head repeat). Supports
a key-padding mask [B,Tk], causal masking with a query offset (cache
prefill), and fully-masked-block skipping for causal prefill.

Backward follows the standard two-kernel recompute scheme with the saved
log-sum-exp: one kernel accumulates dq over k-blocks, one accumulates dk/dv
over q-blocks (no atomics — each kernel owns its output tile).

When the whole sequence fits one block (tq == tk <= SINGLE_BLOCK_MAX),
dedicated single-block kernels take over: plain (non-online) softmax, a
fused one-pass backward, and causal ROW GROUPS — each 128-row group
computes scores only over its visible key extent, 58% of the full matrix
at T=768, exact because every row's complete key range lies inside its
group's slice (_row_groups). Measured per-layer at the bench shape:
fwd 0.986 -> 0.796 ms, fwd+bwd 2.463 -> 1.483 ms (BENCHMARKS.md).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# swept on v5e at B=4 T=768 Hq=16 Hkv=8 D=128 bf16 causal
# (tools/sweep_attention_blocks.py): 256x384 = 1.72 ms vs 128x128 = 2.30 ms
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 384
# when the WHOLE sequence fits a single block there is no online-softmax
# carry and no block-boundary recompute, and the dedicated single-block
# kernels (row groups + fused bwd) apply: 1.483 vs 2.463 ms/layer fwd+bwd
# at the bench shape (in-jit chain, see BENCHMARKS.md). Applied
# automatically (shape-aware default) for tq == tk <= this.
SINGLE_BLOCK_MAX = 768
# A/B knob for on-chip tuning: 0 routes the single-block backward through the
# tiled two-kernel scheme at grid (bh,1,1) instead of the fused one-pass
# kernel (_bwd_single_kernel). Measured on v5e at the bench shape (B=4 T=768
# Hq=16 Hkv=8 D=128 bf16 causal) with an IN-JIT 28-deep chain that consumes
# dq AND dk/dv (a host loop that returns only dq lets XLA drop the tiled
# scheme's whole dk/dv kernel and mis-ranks the variants): fused 2.072 vs
# tiled 2.463 ms/layer fwd+bwd. Default: fused.
_FUSED_SINGLE_BWD = os.environ.get("BIOREASON_FUSED_SINGLE_BWD", "1") == "1"
NEG_INF = -1e30


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, causal, q_offset,
                block_q, block_k, num_k_blocks):
    ki = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_offset
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    run_block = True
    if causal:
        # skip blocks entirely above the diagonal
        first_q = qi * block_q + q_offset
        run_block = ki * block_k <= first_q + block_q - 1

    @pl.when(run_block)
    def _compute():
        # keep operands in the input dtype (bf16 on TPU: full MXU rate) and
        # accumulate in fp32; the softmax scale folds into the fp32 scores
        q = q_ref[0]                                           # [BQ, D]
        k = k_ref[0]                                           # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = mask_ref[0, 0, :] > 0                           # [BK]
        valid = jnp.broadcast_to(mask[None, :], s.shape)
        if causal:
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[:, 0]                                   # [BQ]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        p = jnp.where(valid, p, 0.0)
        l_cur = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)

        v = v_ref[0]                                           # [BK, D]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha[:, None] + pv
        m_scr[:] = jnp.broadcast_to(m_cur[:, None], m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_cur[:, None], l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF,
                                  m_scr[:, 0] + jnp.log(l_safe)).astype(lse_ref.dtype)


def _dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale, causal, q_offset, block_q, block_k,
               num_k_blocks):
    ki = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run_block = True
    if causal:
        first_q = qi * block_q + q_offset
        run_block = ki * block_k <= first_q + block_q - 1

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = mask_ref[0, 0, :] > 0
        valid = jnp.broadcast_to(mask[None, :], s.shape)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_offset
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = valid & (k_pos <= q_pos)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)

        do = do_ref[0]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, None])
        dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal, q_offset,
                block_q, block_k, num_q_blocks):
    qi = pl.program_id(2)   # innermost: iterate q blocks for this k block
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run_block = True
    if causal:
        # q block fully above diagonal -> no contribution
        last_q = qi * block_q + block_q - 1 + q_offset
        run_block = ki * block_k <= last_q

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        mask = mask_ref[0, 0, :] > 0
        valid = jnp.broadcast_to(mask[None, :], s.shape)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_offset
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = valid & (k_pos <= q_pos)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)  # [BQ, BK]

        do = do_ref[0]                                                 # [BQ, D]
        dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)   # [BQ, BK]
        ds = p * (dp - delta_ref[0, 0][:, None])
        dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# row-group height for the single-block causal kernels; swept on v5e at the
# bench shape (in-jit chain, fwd+bwd ms/layer): 64 -> 1.573, 128 -> 1.483,
# 256 -> 1.612, 384 -> 1.697. Exposed for tuning at other shapes.
_ROW_GROUP = int(os.environ.get("BIOREASON_ROW_GROUP", "128"))


def _row_groups(tq: int, tk: int, causal: bool, q_offset: int,
                gs: int = 0):
    """Static (row_start, key_extent) pairs for the single-block kernels.

    Causal row-grouping: rows [r0, r0+gs) can only attend keys
    <= r0+gs-1+q_offset, so each group's score matrix is [gs, ext] instead
    of [tq, tk] — at tq == tk == 768 with gs=128 the computed area is 58%
    of the full matrix, and every row's complete valid key range lies
    inside its group's slice, so per-group plain softmax stays EXACT (no
    online merge). Extents are rounded up to lane multiples (128)."""
    if not gs:
        gs = _ROW_GROUP
    if not causal or tq % gs or tk % 128 or tq // gs <= 1:
        return ((0, tq, tk),)
    groups = []
    for r0 in range(0, tq, gs):
        last = r0 + gs - 1 + q_offset          # last visible key position
        ext = min(tk, _round_up(max(last + 1, 1), 128))
        groups.append((r0, gs, ext))
    return tuple(groups)


def _fwd_single_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                       scale, causal, q_offset, row_groups):
    """Whole-sequence-in-one-block forward: plain (non-online) softmax, no
    running-max/sum scratch, no per-block @pl.when dispatch. Grid (BH,).
    Causal row groups clamp each group's key extent (see _row_groups)."""
    k = k_ref[0]                                               # [Tk, D]
    v = v_ref[0]
    qf = q_ref[0]                                              # [Tq, D]
    mask = mask_ref[0, 0, :] > 0                               # [Tk]
    for r0, gs, ext in row_groups:
        q = qf[r0:r0 + gs]                                     # [gs, D]
        s = jax.lax.dot_general(q, k[:ext], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        valid = jnp.broadcast_to(mask[:ext][None], s.shape)
        if causal:
            q_pos = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                     + r0 + q_offset)
            k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=1)                                 # [gs]
        p = jnp.where(valid, jnp.exp(s - m[:, None]), 0.0)
        l = jnp.sum(p, axis=1)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        pv = jax.lax.dot_general(p.astype(v.dtype), v[:ext],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, r0:r0 + gs] = (pv / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, r0:r0 + gs] = jnp.where(
            l == 0.0, NEG_INF, m + jnp.log(l_safe)).astype(lse_ref.dtype)


def _bwd_single_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       dq_ref, dk_ref, dv_ref, dk_scr=None, dv_scr=None, *,
                       scale, causal, q_offset, group=1,
                       row_groups=((0, 0, 0),)):
    """One-pass fused backward for the single-block case: the score matrix
    and probabilities are computed ONCE (the tiled scheme recomputes them in
    both the dq and dk/dv kernels), delta comes free as rowsum(p * dp)
    (identical to rowsum(do * o)), and dk/dv accumulate across the GQA group
    in fp32 VMEM scratch — the expanded-head grads never round-trip HBM.
    Grid (BH,) with q-head programs of one kv head consecutive, so the dk/dv
    output block (indexed b // group) is revisited, not re-read. Causal row
    groups clamp each group's key extent (see _row_groups); each group
    accumulates its dk/dv slice into the shared scratch."""
    bi = pl.program_id(0)

    @pl.when(bi % group == 0)      # always true at group == 1
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0]
    v = v_ref[0]
    qf = q_ref[0]
    dof = do_ref[0]
    lsef = lse_ref[0, 0]
    mask = mask_ref[0, 0, :] > 0
    for r0, gs, ext in row_groups:
        q = qf[r0:r0 + gs]
        do = dof[r0:r0 + gs]
        s = jax.lax.dot_general(q, k[:ext], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        valid = jnp.broadcast_to(mask[:ext][None], s.shape)
        if causal:
            q_pos = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                     + r0 + q_offset)
            k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = valid & (k_pos <= q_pos)
        p = jnp.where(valid,
                      jnp.exp(s - lsef[r0:r0 + gs][:, None]), 0.0)

        dp = jax.lax.dot_general(do, v[:ext], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=1)                            # [gs]
        ds = p * (dp - delta[:, None])
        dq_ref[0, r0:r0 + gs] = (jax.lax.dot_general(
            ds.astype(k.dtype), k[:ext], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)

        pb = p.astype(do.dtype)
        dsb = ds.astype(q.dtype)
        dv_scr[:ext] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[:ext] += jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(bi % group == group - 1)      # always true at group == 1
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------


def _pad_len(t: int, block: int) -> int:
    return (block - t % block) % block


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, kv_mask, causal, q_offset, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(q, k, v, kv_mask, causal, q_offset, block_q,
                             block_k, interpret)
    return out


def _flash_fwd_impl(q, k, v, kv_mask, causal, q_offset, block_q, block_k, interpret):
    """q [BH, Tq, D] (already head-flattened), k/v [BHkv, Tk, D],
    kv_mask [BH, Tk] (pre-expanded to q heads)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    group = bh // k.shape[0]
    scale = d ** -0.5
    nq, nk = tq // block_q, tk // block_k

    if nq == 1 and nk == 1:
        out, lse = pl.pallas_call(
            functools.partial(_fwd_single_kernel, scale=scale, causal=causal,
                              q_offset=q_offset,
                              row_groups=_row_groups(tq, tk, causal, q_offset)),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, 1, tk), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, tq), lambda b: (b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32),
            ],
            interpret=interpret,
        )(kv_mask, q, k, v)
        return out, lse

    grid = (bh, nq, nk)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, q_offset=q_offset,
        block_q=block_q, block_k=block_k, num_k_blocks=nk)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(kv_mask, q, k, v)
    return out, lse


def _flash_fwd(q, k, v, kv_mask, causal, q_offset, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, kv_mask, causal, q_offset, block_q,
                               block_k, interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(causal, q_offset, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    bh, tq, d = q.shape
    tk = k.shape[1]
    group = bh // k.shape[0]
    scale = d ** -0.5
    nq, nk = tq // block_q, tk // block_k

    if nq == 1 and nk == 1 and _FUSED_SINGLE_BWD:
        bhkv = k.shape[0]
        scr = [pltpu.VMEM((tk, d), jnp.float32),
               pltpu.VMEM((tk, d), jnp.float32)]
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_single_kernel, scale=scale, causal=causal,
                              q_offset=q_offset, group=group,
                              row_groups=_row_groups(tq, tk, causal, q_offset)),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, 1, tk), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, tq), lambda b: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
                pl.BlockSpec((1, tk, d), lambda b: (b // group, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
                jax.ShapeDtypeStruct((bhkv, tk, d), k.dtype),
                jax.ShapeDtypeStruct((bhkv, tk, d), v.dtype),
            ],
            scratch_shapes=scr,
            interpret=interpret,
        )(kv_mask, q, k, v, g, lse)
        return dq, dk, dv, None

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                    axis=-1)[:, None, :]                                 # [BH,1,Tq]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          q_offset=q_offset, block_q=block_q, block_k=block_k,
                          num_k_blocks=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(kv_mask, q, k, v, g, lse, delta)

    dk_exp, dv_exp = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          q_offset=q_offset, block_q=block_q, block_k=block_k,
                          num_q_blocks=nq),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b // group, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b // group, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(kv_mask, q, k, v, g, lse, delta)

    # fold expanded-head grads back to kv heads
    bhkv = k.shape[0]
    dk = dk_exp.reshape(bhkv, group, tk, d).sum(axis=1).astype(k.dtype)
    dv = dv_exp.reshape(bhkv, group, tk, d).sum(axis=1).astype(v.dtype)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, kv_mask=None, causal=False, q_offset=None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    interpret: Optional[bool] = None):
    """Drop-in for models.attention.xla_attention.

    q [B,Tq,Hq,D], k/v [B,Tk,Hkv,D], kv_mask [B,Tk] -> [B,Tq,Hq,D].
    """
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if q_offset is None:
        q_offset = tk - tq if causal else 0

    if (block_q == DEFAULT_BLOCK_Q and block_k == DEFAULT_BLOCK_K
            and tq == tk and tq <= SINGLE_BLOCK_MAX and tq % 128 == 0):
        # shape-aware default: single-block fast path (see SINGLE_BLOCK_MAX)
        block_q = block_k = tq
    block_q = min(block_q, max(tq, 8))
    block_k = min(block_k, max(tk, 8))
    pq, pk = _pad_len(tq, block_q), _pad_len(tk, block_k)

    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pk)))

    tq_p, tk_p = tq + pq, tk + pk
    # head-major flatten: [B,H,T,D] -> [B*H, T, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * hq, tq_p, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * hkv, tk_p, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * hkv, tk_p, d)
    maskf = jnp.repeat(kv_mask, hq, axis=0)[:, None, :]        # [B*Hq, 1, Tk]

    out = _flash(qf, kf, vf, maskf, causal, q_offset, block_q, block_k, interpret)
    out = out.reshape(b, hq, tq_p, d).transpose(0, 2, 1, 3)
    return out[:, :tq]
