"""Pallas TPU banded (sliding-window) attention — splash-style block
sparsity for very long DNA contexts.

The reference caps DNA context by truncation (dataset/utils.py:6-20,
SURVEY §5 long-context); the encoders here already lift the memory wall
(flash attention + sequence parallelism), but full bidirectional attention
is still O(S²) FLOPs. This kernel restricts each query to the |i-j| <= W
band, so compute is O(S·W): at S=32k, W=512 that is ~30x fewer FLOPs — the
difference between hours and minutes per epoch on 100k-token contexts.

Structure follows ops/flash_attention.py (online softmax, VMEM scratch
across the innermost sequential grid axis, GQA via index-map head folding,
two-kernel backward with saved LSE). The sparsity is in the GRID, not just
the mask: with block size L and radius R = ceil(W/L), the k-axis of the
grid is only 2R+1 wide and the k/v BlockSpec index map picks block
clamp(qi - R + j) — out-of-range steps are clamped-duplicates and skipped
via pl.when (no DMA'd block is ever double-counted). Blocks are square
(block_q == block_k) so the band geometry is symmetric in both passes.

This is an opt-in ACCURACY TRADE (local attention, not an exact rewrite of
full attention): route with EncoderConfig.attention_impl = "local:<W>".
Numerics vs a full-precision banded oracle are pinned in
tests/test_local_attention.py, forward and grads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256
NEG_INF = -1e30


def _band_kidx(qi, j, radius, nk):
    """k-block index for band step j of q-block qi, clamped into range."""
    raw = qi - radius + j
    return jnp.clip(raw, 0, nk - 1)


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, window, radius, block,
                nk, n_band):
    j = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    raw = qi - radius + j
    run_block = (raw >= 0) & (raw < nk)        # clamped duplicate -> skip

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]                                           # [L, D]
        k = k_ref[0]                                           # [L, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qi * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = raw * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = jnp.abs(q_pos - k_pos) <= window
        valid = valid & jnp.broadcast_to((mask_ref[0, 0, :] > 0)[None, :], s.shape)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.where(valid, jnp.exp(s - m_cur[:, None]), 0.0)
        l_cur = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)

        v = v_ref[0]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha[:, None] + pv
        m_scr[:] = jnp.broadcast_to(m_cur[:, None], m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_cur[:, None], l_scr.shape)

    @pl.when(j == n_band - 1)
    def _finalize():
        l = l_scr[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF,
                                  m_scr[:, 0] + jnp.log(l_safe)).astype(lse_ref.dtype)


def _dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale, window, radius, block, nk, n_band):
    j = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    raw = qi - radius + j
    run_block = (raw >= 0) & (raw < nk)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qi * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = raw * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = (jnp.abs(q_pos - k_pos) <= window) & \
            jnp.broadcast_to((mask_ref[0, 0, :] > 0)[None, :], s.shape)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)

        do = do_ref[0]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, None])
        dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale

    @pl.when(j == n_band - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale, window, radius,
                block, nq, n_band):
    j = pl.program_id(2)     # band step over q blocks for this k block
    ki = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    raw = ki - radius + j    # symmetric band: contributing q block
    run_block = (raw >= 0) & (raw < nq)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = raw * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = ki * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = (jnp.abs(q_pos - k_pos) <= window) & \
            jnp.broadcast_to((mask_ref[0, 0, :] > 0)[None, :], s.shape)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)

        do = do_ref[0]
        dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, None])
        dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale

    @pl.when(j == n_band - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _local(q, k, v, kv_mask, window, block, interpret):
    out, _ = _local_fwd_impl(q, k, v, kv_mask, window, block, interpret)
    return out


def _specs(block, d, group, radius, nk_or_nq, kv_side):
    """BlockSpecs shared by the three kernels (band-clamped k/v or q)."""
    def kv_map(b, i, j):
        return (b // group, _band_kidx(i, j, radius, nk_or_nq), 0)
    if kv_side:
        return pl.BlockSpec((1, block, d), kv_map)
    return pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0))


def _local_fwd_impl(q, k, v, kv_mask, window, block, interpret):
    bh, tq, d = q.shape
    tk = k.shape[1]
    group = bh // k.shape[0]
    scale = d ** -0.5
    nq, nk = tq // block, tk // block
    radius = (window + block - 1) // block
    n_band = 2 * radius + 1

    kernel = functools.partial(
        _fwd_kernel, scale=scale, window=window, radius=radius, block=block,
        nk=nk, n_band=n_band)

    def kmap(b, i, j):
        return (b // group, _band_kidx(i, j, radius, nk), 0)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, n_band),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, _band_kidx(i, j, radius, nk))),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block, d), kmap),
            pl.BlockSpec((1, block, d), kmap),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        interpret=interpret,
    )(kv_mask, q, k, v)
    return out, lse


def _local_fwd(q, k, v, kv_mask, window, block, interpret):
    out, lse = _local_fwd_impl(q, k, v, kv_mask, window, block, interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _local_bwd(window, block, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    bh, tq, d = q.shape
    tk = k.shape[1]
    group = bh // k.shape[0]
    scale = d ** -0.5
    nq, nk = tq // block, tk // block
    radius = (window + block - 1) // block
    n_band = 2 * radius + 1

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                    axis=-1)[:, None, :]

    def kmap(b, i, j):
        return (b // group, _band_kidx(i, j, radius, nk), 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, window=window,
                          radius=radius, block=block, nk=nk, n_band=n_band),
        grid=(bh, nq, n_band),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, _band_kidx(i, j, radius, nk))),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block, d), kmap),
            pl.BlockSpec((1, block, d), kmap),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
        interpret=interpret,
    )(kv_mask, q, k, v, g, lse, delta)

    def qmap(b, i, j):
        return (b, _band_kidx(i, j, radius, nq), 0)

    dk_exp, dv_exp = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, window=window,
                          radius=radius, block=block, nq=nq, n_band=n_band),
        grid=(bh, nk, n_band),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, block, d), qmap),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b // group, i, 0)),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b // group, i, 0)),
            pl.BlockSpec((1, block, d), qmap),
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, _band_kidx(i, j, radius, nq))),
            pl.BlockSpec((1, 1, block), lambda b, i, j: (b, 0, _band_kidx(i, j, radius, nq))),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block, d), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        interpret=interpret,
    )(kv_mask, q, k, v, g, lse, delta)

    bhkv = k.shape[0]
    dk = dk_exp.reshape(bhkv, group, tk, d).sum(axis=1).astype(k.dtype)
    dv = dv_exp.reshape(bhkv, group, tk, d).sum(axis=1).astype(v.dtype)
    return dq, dk, dv, None


_local.defvjp(_local_fwd, _local_bwd)


def local_attention(q, k, v, window: int, kv_mask=None,
                    block: int = DEFAULT_BLOCK,
                    interpret: Optional[bool] = None):
    """Banded bidirectional attention: query i attends keys |i-j| <= window.

    q [B,T,Hq,D], k/v [B,T,Hkv,D], kv_mask [B,T] -> [B,T,Hq,D].
    Compute/HBM scale as O(T·window) instead of O(T²).
    """
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    if tq != tk:
        raise ValueError("local_attention is for self-attention (Tq == Tk)")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    block = min(block, max(tq, 8))
    pad = (block - tq % block) % block
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))

    t = tq + pad
    qf = q.transpose(0, 2, 1, 3).reshape(b * hq, t, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * hkv, t, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * hkv, t, d)
    maskf = jnp.repeat(kv_mask, hq, axis=0)[:, None, :]

    out = _local(qf, kf, vf, maskf, int(window), block, interpret)
    out = out.reshape(b, hq, t, d).transpose(0, 2, 1, 3)
    return out[:, :tq]
