"""Attention dispatch: Pallas flash kernel on TPU, XLA einsum fallback.

Replaces the reference's flash-attention-2 dependency
(grpo_trainer.py:220,237 `attn_implementation="flash_attention_2"`) with a
TPU-native path. `impl='auto'` picks the Pallas kernel on TPU for shapes that
tile onto the MXU and the XLA path otherwise (tiny test shapes, CPU meshes,
decode steps with q_len==1 where a fused kernel buys nothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def xla_attention(q, k, v, kv_mask=None, causal=False, q_offset=None,
                  logits_dtype=jnp.float32, k_scale=None, v_scale=None):
    """q: [B,Tq,Hq,D], k/v: [B,Tk,Hkv,D], kv_mask: [B,Tk] (1=valid).

    GQA is handled with grouped einsums — the expanded [B,Tk,Hq,D] K/V is
    never materialized (a 100MB-per-layer copy per decode step at rollout
    shapes). When `causal`, query i attends to keys j with
    j <= i + q_offset, where `q_offset` is the absolute position of query 0
    among the keys; defaults to Tk - Tq (right-aligned, the no-cache case).

    `k_scale`/`v_scale` [B,Tk,Hkv,1]: int8-KV-cache dequantization factors.
    They are applied to the LOGITS / PROBS (exact: scales are per key token-
    head, and (s*k)·q == s*(k·q)), NOT to K/V — so the int8 cache streams
    straight into the matmuls with only a fused convert, never materializing
    a dequantized bf16 copy (measured 1.4x slower than bf16 when done
    naively: the temp copy costs write+read bandwidth)."""
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = d ** -0.5

    qg = q.reshape(b, tq, hkv, group, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k.astype(q.dtype),
                        preferred_element_type=logits_dtype) * scale
    if k_scale is not None:
        ks = jnp.transpose(k_scale[..., 0], (0, 2, 1)).astype(logits_dtype)
        logits = logits * ks[:, :, None, None, :]

    neg = jnp.finfo(logits_dtype).min
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, None, :].astype(bool), logits, neg)
    if causal:
        if q_offset is None:
            q_offset = tk - tq
        qi = jnp.arange(tq)[:, None] + q_offset
        kj = jnp.arange(tk)[None, :]
        logits = jnp.where((kj <= qi)[None, None, None, :, :], logits, neg)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        vs = jnp.transpose(v_scale[..., 0], (0, 2, 1))
        probs = probs * vs[:, :, None, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v.astype(q.dtype))
    return out.reshape(b, tq, hq, d)


def attention(q, k, v, kv_mask=None, causal=False, q_offset=None, impl="auto",
              k_scale=None, v_scale=None):
    """Multi-head (grouped-query) attention. Shapes as in `xla_attention`.

    impl='sp' / 'sp_pallas': sequence-parallel attention for long-DNA
    encoders — the sequence axis stays sharded over the mesh axis registered
    via parallel.sp.enable_sequence_sharding (parallel/sp.py).

    `k_scale`/`v_scale`: int8-KV-cache scales — forces the XLA path (the
    Pallas kernel consumes float K/V)."""
    if isinstance(impl, str) and impl.startswith("sp_local:"):
        # banded + sequence-parallel: window-token halo exchange instead of
        # a full K/V all-gather (parallel/sp.py:sp_local_attention)
        if causal:
            raise NotImplementedError("sp_local attention is bidirectional-only")
        from bioreason_tpu.parallel.sp import sp_local_attention
        return sp_local_attention(q, k, v, int(impl.split(":", 1)[1]),
                                  kv_mask=kv_mask)
    if impl in ("sp", "sp_pallas"):
        from bioreason_tpu.parallel.sp import sp_attention
        return sp_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                            impl="pallas" if impl == "sp_pallas" else "xla")
    if isinstance(impl, str) and impl.startswith("local:"):
        # banded sliding-window attention for very long DNA contexts
        # (ops/local_attention.py): O(T*W) instead of O(T^2). Opt-in
        # accuracy trade; bidirectional encoders only.
        if causal:
            raise NotImplementedError("local attention is bidirectional-only")
        from bioreason_tpu.ops.local_attention import local_attention
        return local_attention(q, k, v, int(impl.split(":", 1)[1]),
                               kv_mask=kv_mask)
    if k_scale is not None or v_scale is not None:
        return xla_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                             q_offset=q_offset, k_scale=k_scale, v_scale=v_scale)
    if impl == "auto":
        use_pallas = (
            _on_tpu()
            and q.shape[1] >= 128          # decode / tiny shapes: XLA is fine
            and q.shape[-1] in (64, 128, 256)
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from bioreason_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, kv_mask=kv_mask, causal=causal, q_offset=q_offset)
    return xla_attention(q, k, v, kv_mask=kv_mask, causal=causal, q_offset=q_offset)
