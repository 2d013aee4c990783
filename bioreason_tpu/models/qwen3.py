"""Qwen3-style causal decoder, TPU-first.

Functional rebuild of the reference text tower (HF `AutoModelForCausalLM`
Qwen3, reference dna_llm.py:64-70): pre-norm RMSNorm transformer with
grouped-query attention, per-head q/k RMSNorm before RoPE (Qwen3 signature),
SwiGLU MLP and tied embeddings.

TPU-first design:
  * layers are STACKED along a leading axis and executed with `lax.scan`
    (one trace/compile for all layers; rematerialization per layer via
    `jax.checkpoint` when cfg.remat);
  * accepts `inputs_embeds` so the DNA splice can inject embeddings
    (reference forward path dna_llm.py:237-242);
  * explicit KV cache (per-layer {k,v} [B,S,Hkv,D] buffers; see init_cache
    for why they are not stacked) written with `dynamic_update_slice` for the
    jitted prefill+decode generation engine — the replacement for the
    reference's HF-generate/vLLM rollout path;
  * positions derived from the attention mask (left-padding robust).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bioreason_tpu.config import DecoderConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.attention import attention


def init_decoder(rng, cfg: DecoderConfig) -> Dict:
    k_embed, k_layers, k_head = jax.random.split(rng, 3)

    def init_layer(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        qkv_dim = cfg.num_heads * cfg.head_dim
        kv_dim = cfg.num_kv_heads * cfg.head_dim
        return {
            "ln1": L.rmsnorm_init(cfg.hidden_size),
            "attn": {
                "q": L.dense_init(k1, cfg.hidden_size, qkv_dim),
                "k": L.dense_init(k2, cfg.hidden_size, kv_dim),
                "v": L.dense_init(k3, cfg.hidden_size, kv_dim),
                "o": L.dense_init(k4, qkv_dim, cfg.hidden_size),
                "q_norm": L.rmsnorm_init(cfg.head_dim),
                "k_norm": L.rmsnorm_init(cfg.head_dim),
            },
            "ln2": L.rmsnorm_init(cfg.hidden_size),
            "mlp": (L.moe_init(k5, cfg.hidden_size, cfg.num_experts,
                               cfg.moe_intermediate_size)
                    if cfg.num_experts
                    else L.swiglu_init(k5, cfg.hidden_size, cfg.intermediate_size)),
        }

    params = {
        "embed": L.embed_init(k_embed, cfg.vocab_size, cfg.hidden_size),
        "layers": jax.vmap(init_layer)(jax.random.split(k_layers, cfg.num_layers)),
        "final_norm": L.rmsnorm_init(cfg.hidden_size),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = L.dense_init(k_head, cfg.hidden_size, cfg.vocab_size)
    return params


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               quantize: bool = False):
    """Per-layer KV cache: a LIST of {k,v} [B,S,Hkv,D] arrays.

    Deliberately NOT a stacked [L,...] array: stacked caches threaded through
    lax.scan get sliced/updated/restacked every decode step (~2.5 ms/layer of
    pure copy traffic measured on v5e); separate per-layer buffers updated in
    an inlined layer loop let XLA do the dynamic_update_slice in place.

    `quantize=True` stores K/V int8 with per-(token,head) absmax scales
    (the vLLM fp8-KV-cache role, in the dtype v5e has): decode attention is
    cache-bandwidth-bound at large batch, so halving cache bytes buys
    throughput at ~0.4% K/V RMS error."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if quantize:
        sshape = shape[:-1] + (1,)
        return [{"k": jnp.zeros(shape, jnp.int8), "v": jnp.zeros(shape, jnp.int8),
                 "k_scale": jnp.zeros(sshape, jnp.float32),
                 "v_scale": jnp.zeros(sshape, jnp.float32)}
                for _ in range(cfg.num_layers)]
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(cfg.num_layers)]


def _kv_quantize(x):
    """[..., D] float -> (int8 [..., D], f32 scale [..., 1]) per-row absmax."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.rint(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def cache_entry_update(entry, k, v, index):
    """Write new K/V [B,T,Hkv,D] at `index` into a cache entry (quantizing
    when the entry carries scales). Returns the updated entry dict."""
    dus = jax.lax.dynamic_update_slice
    at = (0, index, 0, 0)
    if "k_scale" in entry:
        qk, sk = _kv_quantize(k)
        qv, sv = _kv_quantize(v)
        return {"k": dus(entry["k"], qk, at), "v": dus(entry["v"], qv, at),
                "k_scale": dus(entry["k_scale"], sk.astype(entry["k_scale"].dtype), at),
                "v_scale": dus(entry["v_scale"], sv.astype(entry["v_scale"].dtype), at)}
    return {"k": dus(entry["k"], k.astype(entry["k"].dtype), at),
            "v": dus(entry["v"], v.astype(entry["v"].dtype), at)}


def cache_entry_read(entry, dtype):
    """Full K/V [B,S,Hkv,D] in compute dtype, dequantizing int8 entries.

    NOTE: hot paths do NOT use this — materializing the dequantized copy
    costs write+read bandwidth (measured 1.4x slower than bf16 caches).
    They pass the int8 buffers plus scales to the attention kernels, which
    apply the scales to logits/probs instead (xla_attention k_scale/v_scale).
    Kept for debugging/tests."""
    k = entry["k"].astype(dtype)
    v = entry["v"].astype(dtype)
    if "k_scale" in entry:
        k = k * entry["k_scale"].astype(dtype)
        v = v * entry["v_scale"].astype(dtype)
    return k, v


def _mlp(lp, cfg: DecoderConfig, x, dtype, lora_dropout=None):
    """Dense SwiGLU or Mixture-of-Experts FFN per cfg.num_experts."""
    if cfg.num_experts:
        return L.moe_apply(lp["mlp"], x, cfg.num_experts_per_tok,
                           cfg.norm_topk_prob, dtype, cfg.moe_capacity_factor)
    return L.swiglu(lp["mlp"], x, dtype, lora_dropout, cfg.act_int8)


def _layer_forward(lp, h, cfg: DecoderConfig, positions, kv_mask, causal,
                   cache_entry=None, cache_index=None, lora_dropout=None):
    """One decoder block. h: [B,T,H]. Returns (h, (new_k, new_v))."""
    dtype = h.dtype
    b, t, _ = h.shape

    def drop(i):
        if lora_dropout is None:
            return None
        key, rate = lora_dropout
        return (jax.random.fold_in(key, i), rate)

    a8 = cfg.act_int8
    x = L.rmsnorm(lp["ln1"], h, cfg.rms_norm_eps)
    q, k, v = L.qkv_proj(lp["attn"], x, dtype,
                         cfg.num_heads * cfg.head_dim,
                         cfg.num_kv_heads * cfg.head_dim,
                         drops=(drop(0), drop(1), drop(2)), act8=a8)
    q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)

    q = L.rmsnorm(lp["attn"]["q_norm"], q, cfg.rms_norm_eps)
    k = L.rmsnorm(lp["attn"]["k_norm"], k, cfg.rms_norm_eps)
    q = L.apply_rope(q, positions, cfg.rope_theta)
    k = L.apply_rope(k, positions, cfg.rope_theta)

    ks = vs = None
    if cache_entry is not None:
        new_kv = cache_entry_update(cache_entry, k, v, cache_index)
        if "k_scale" in new_kv and t > 1:
            # quantized-cache PREFILL: the block being written is the only
            # valid cache content (all callers prefill into fresh caches),
            # so attend over the fresh bf16 K/V — keeps the flash kernel and
            # skips the int8 round-trip for the big causal pass
            k_all, v_all = k, v
            kv_mask = jax.lax.dynamic_slice_in_dim(kv_mask, cache_index, t, 1)
        else:
            k_all, v_all = new_kv["k"], new_kv["v"]
            ks, vs = new_kv.get("k_scale"), new_kv.get("v_scale")
    else:
        k_all, v_all = k, v
        new_kv = None

    attn_out = attention(q, k_all, v_all, kv_mask=kv_mask, causal=causal,
                         q_offset=cache_index if cache_entry is not None else None,
                         impl=cfg.attention_impl, k_scale=ks, v_scale=vs)
    h = h + L.dense(lp["attn"]["o"], attn_out.reshape(b, t, -1), dtype, drop(3), a8)

    x = L.rmsnorm(lp["ln2"], h, cfg.rms_norm_eps)
    h = h + _mlp(lp, cfg, x, dtype,
                 None if lora_dropout is None
                 else (jax.random.fold_in(lora_dropout[0], 4), lora_dropout[1]))
    return h, new_kv


def decoder_forward(
    params: Dict,
    cfg: DecoderConfig,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    cache: Optional[Dict] = None,
    cache_index: int = 0,
    cache_mask: Optional[jnp.ndarray] = None,
    return_hidden: bool = False,
    lora_dropout_rng: Optional[jnp.ndarray] = None,
    lora_dropout_rate: float = 0.0,
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Run the decoder.

    Without cache: causal self-attention over the current block
    (`attention_mask` [B,T] marks valid tokens; left padding supported).
    With cache: keys/values for the block are written at `cache_index`;
    attention runs over the whole cache with `cache_mask` [B,S_cache]
    marking valid cache slots (causality is implied by the mask since
    future slots are still invalid).
    """
    dtype = jnp.dtype(cfg.dtype)
    if inputs_embeds is None:
        inputs_embeds = L.embed(params["embed"], input_ids, dtype)
    h = inputs_embeds.astype(dtype)
    b, t, _ = h.shape

    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    if positions is None:
        positions = L.positions_from_mask(attention_mask)

    if cache is not None:
        kv_mask, causal = cache_mask, (t > 1)
    else:
        kv_mask, causal = attention_mask, True

    use_dropout = lora_dropout_rng is not None and lora_dropout_rate > 0.0
    if cache is None:
        from bioreason_tpu.parallel.pp import pipeline_enabled
        if pipeline_enabled():
            # GPipe pipeline over the layer stack (parallel/pp.py): trainers
            # activate the scope (SFTConfig.pp_micro > 0); the stacked [L,...]
            # params shard one contiguous stage per device on the pipeline
            # axis. Remat is per-stage implicit (each tick recomputes its
            # microbatch activations through AD of the scan).
            from bioreason_tpu.parallel.pp import pipeline_state, pp_decoder_layers
            mesh, axis, n_micro = pipeline_state()
            lk = (jax.random.split(lora_dropout_rng, cfg.num_layers)
                  if use_dropout else None)
            h = pp_decoder_layers(
                params["layers"], h, cfg, positions, kv_mask, mesh,
                axis=axis, n_micro=n_micro, layer_keys=lk,
                lora_dropout_rate=lora_dropout_rate if use_dropout else 0.0)
            new_cache_list = None
        elif use_dropout:
            layer_keys = jax.random.split(lora_dropout_rng, cfg.num_layers)

            def body(h, xs):
                lp, key = xs
                h, _ = _layer_forward(lp, h, cfg, positions, kv_mask, causal,
                                      lora_dropout=(key, lora_dropout_rate))
                return h, None
            body_fn = L.remat(body, cfg)
            h, new_cache_list = jax.lax.scan(body_fn, h, (params["layers"], layer_keys))
        else:
            def body(h, lp):
                h, _ = _layer_forward(lp, h, cfg, positions, kv_mask, causal)
                return h, None
            body_fn = L.remat(body, cfg)
            h, new_cache_list = jax.lax.scan(body_fn, h, params["layers"])
    else:
        # inlined layer loop: per-layer cache buffers update in place
        new_cache_list = []
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda x: x[i], params["layers"])
            h, new_kv = _layer_forward(lp, h, cfg, positions, kv_mask, causal,
                                       cache[i], cache_index)
            new_cache_list.append(new_kv)

    h = L.rmsnorm(params["final_norm"], h, cfg.rms_norm_eps)
    logits = h if return_hidden else L.lm_logits(params, h)

    new_cache = None if cache is None else new_cache_list
    return logits, new_cache


# ---------------------------------------------------------------------------
# Grouped decode: G completions share one prompt KV cache (GRPO rollouts).
#
# The engine's first implementation expanded the prompt cache G-fold with
# jnp.repeat (VERDICT r1 item 5: a large avoidable HBM spike AND G x the
# prompt-cache bandwidth every decode step — decode attention is bandwidth
# bound). Here the prompt KV stays [B_u, P] (shared, read once per group)
# and only the decode slots live per-completion [B_u*G, N]; the two logit
# blocks are merged in ONE numerically-exact softmax.
# ---------------------------------------------------------------------------


def init_decode_cache(cfg: DecoderConfig, batch: int, max_new: int,
                      dtype=jnp.bfloat16, quantize: bool = False):
    """Per-layer decode-slot KV cache: [B, max_new, Hkv, D] per layer."""
    return init_cache(cfg, batch, max_new, dtype, quantize=quantize)


def _grouped_decode_attention(q, pk, pv, prompt_mask, dk, dv, dec_mask, group: int,
                              pk_scale=None, pv_scale=None,
                              dk_scale=None, dv_scale=None):
    """q: [B_u*G, 1, Hq, D]; pk/pv: [B_u, P, Hkv, D] (shared per group);
    dk/dv: [B_u*G, N, Hkv, D]; prompt_mask: [B_u, P]; dec_mask: [B_u*G, N].
    Returns [B_u*G, 1, Hq, D].

    `*_scale` [.., T, Hkv, 1]: int8-KV dequantization factors, applied to
    the logits/probs (exact; see xla_attention) so the int8 cache feeds the
    matmuls directly without a materialized bf16 copy."""
    bg, _, hq, d = q.shape
    bu, p_len, hkv, _ = pk.shape
    n = dk.shape[1]
    gr = hq // hkv
    scale = d ** -0.5
    neg = jnp.finfo(jnp.float32).min

    qg = q.reshape(bu, group, hkv, gr, d)
    # prompt block: shared keys read ONCE per group (not per completion)
    lp = jnp.einsum("bghrd,bphd->bghrp", qg, pk.astype(q.dtype),
                    preferred_element_type=jnp.float32) * scale
    if pk_scale is not None:
        lp = lp * jnp.transpose(pk_scale[..., 0], (0, 2, 1))[:, None, :, None, :]
    lp = jnp.where(prompt_mask[:, None, None, None, :].astype(bool), lp, neg)
    # decode block: per-completion keys
    qd = q.reshape(bg, hkv, gr, d)
    ld = jnp.einsum("bhrd,bnhd->bhrn", qd, dk.astype(q.dtype),
                    preferred_element_type=jnp.float32) * scale
    if dk_scale is not None:
        ld = ld * jnp.transpose(dk_scale[..., 0], (0, 2, 1))[:, :, None, :]
    ld = jnp.where(dec_mask[:, None, None, :].astype(bool), ld, neg)

    # one softmax across both blocks
    both = jnp.concatenate([lp.reshape(bg, hkv, gr, p_len), ld], axis=-1)
    probs = jax.nn.softmax(both, axis=-1)
    probs_p = probs[..., :p_len].reshape(bu, group, hkv, gr, p_len)
    probs_d = probs[..., p_len:]
    if pv_scale is not None:
        probs_p = probs_p * jnp.transpose(pv_scale[..., 0], (0, 2, 1))[:, None, :, None, :]
    if dv_scale is not None:
        probs_d = probs_d * jnp.transpose(dv_scale[..., 0], (0, 2, 1))[:, :, None, :]
    probs_p = probs_p.astype(q.dtype)
    probs_d = probs_d.astype(q.dtype)
    out = (jnp.einsum("bghrp,bphd->bghrd", probs_p, pv.astype(q.dtype))
           .reshape(bg, hkv, gr, d)
           + jnp.einsum("bhrn,bnhd->bhrd", probs_d, dv.astype(q.dtype)))
    return out.reshape(bg, 1, hq, d)


def decoder_decode_step_grouped(params: Dict, cfg: DecoderConfig,
                                input_ids: jnp.ndarray, positions: jnp.ndarray,
                                prompt_cache, prompt_mask: jnp.ndarray,
                                dec_cache, dec_index, dec_mask: jnp.ndarray,
                                group: int):
    """One decode step for B_u*G rows sharing B_u prompt caches.

    input_ids [B_u*G, 1]; positions [B_u*G, 1]; prompt_cache = per-layer
    {k,v} [B_u, P, ...] (NOT written); dec_cache = per-layer {k,v}
    [B_u*G, N, ...] written at dec_index; dec_mask [B_u*G, N] marks valid
    decode slots INCLUDING the one being written. Returns (logits, dec_cache).

    Decode stays weight-only int8 even when cfg.act_int8 requests W8A8:
    per-token act8 decode measured SLOWER (10.7k -> 9.8k tok/s, see
    generate/continuous.py) and adds per-token quantization error, so
    act_int8 is prefill-only by design.
    """
    if cfg.act_int8:
        import dataclasses
        cfg = dataclasses.replace(cfg, act_int8=False)
    dtype = jnp.dtype(cfg.dtype)
    h = L.embed(params["embed"], input_ids, dtype)
    bg, t, _ = h.shape

    new_cache = []
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        x = L.rmsnorm(lp["ln1"], h, cfg.rms_norm_eps)
        q, k, v = L.qkv_proj(lp["attn"], x, dtype,
                             cfg.num_heads * cfg.head_dim,
                             cfg.num_kv_heads * cfg.head_dim)
        q = q.reshape(bg, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(bg, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(bg, t, cfg.num_kv_heads, cfg.head_dim)
        q = L.rmsnorm(lp["attn"]["q_norm"], q, cfg.rms_norm_eps)
        k = L.rmsnorm(lp["attn"]["k_norm"], k, cfg.rms_norm_eps)
        q = L.apply_rope(q, positions, cfg.rope_theta)
        k = L.apply_rope(k, positions, cfg.rope_theta)

        new_entry = cache_entry_update(dec_cache[i], k, v, dec_index)
        new_cache.append(new_entry)
        pe = prompt_cache[i]

        attn = _grouped_decode_attention(
            q, pe["k"], pe["v"], prompt_mask, new_entry["k"], new_entry["v"],
            dec_mask, group,
            pk_scale=pe.get("k_scale"), pv_scale=pe.get("v_scale"),
            dk_scale=new_entry.get("k_scale"), dv_scale=new_entry.get("v_scale"))
        h = h + L.dense(lp["attn"]["o"], attn.reshape(bg, t, -1), dtype)
        x = L.rmsnorm(lp["ln2"], h, cfg.rms_norm_eps)
        h = h + _mlp(lp, cfg, x, dtype)

    h = L.rmsnorm(params["final_norm"], h, cfg.rms_norm_eps)
    logits = L.lm_logits(params, h)
    return logits, new_cache


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = -100) -> jnp.ndarray:
    """Shifted causal LM loss, mean over supervised tokens (HF semantics:
    logits[:, :-1] predict labels[:, 1:]; reference relies on HF computing
    this internally — dna_llm.py:237-242)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)
