"""NT-v2-style bidirectional DNA encoder (ESM architecture family).

Functional rebuild of the reference DNA tower (HF `AutoModelForMaskedLM` over
NucleotideTransformer-v2, reference dna_llm.py:79-83). NT-v2 is an ESM-style
pre-norm transformer with rotary embeddings, SwiGLU MLPs and LayerNorm; the
fusion model consumes its LAST hidden state (dna_llm.py:156), so the MLM head
is optional and omitted by default.

Same TPU discipline as the decoder: stacked layers + lax.scan, bidirectional
attention with a key-padding mask, bf16 compute.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from bioreason_tpu.config import EncoderConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.attention import attention


def init_encoder(rng, cfg: EncoderConfig) -> Dict:
    k_embed, k_layers = jax.random.split(rng)

    def init_layer(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        d = cfg.hidden_size
        ab, mb = cfg.attn_bias, cfg.mlp_bias
        return {
            "ln1": L.layernorm_init(d),
            "attn": {
                "q": L.dense_init(k1, d, d, bias=ab),
                "k": L.dense_init(k2, d, d, bias=ab),
                "v": L.dense_init(k3, d, d, bias=ab),
                "o": L.dense_init(k4, d, d, bias=ab),
            },
            "ln2": L.layernorm_init(d),
            "mlp": (L.swiglu_init(k5, d, cfg.intermediate_size, bias=mb) if cfg.use_swiglu
                    else L.gelu_mlp_init(k5, d, cfg.intermediate_size, bias=mb)),
        }

    return {
        "embed": L.embed_init(k_embed, cfg.vocab_size, cfg.hidden_size),
        "layers": jax.vmap(init_layer)(jax.random.split(k_layers, cfg.num_layers)),
        "final_norm": L.layernorm_init(cfg.hidden_size),
    }


def encoder_forward(params: Dict, cfg: EncoderConfig, input_ids: jnp.ndarray,
                    attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Returns the last hidden state [B, T, H] (in cfg.dtype)."""
    dtype = jnp.dtype(cfg.dtype)
    h = L.embed(params["embed"], input_ids, dtype)
    b, t, _ = h.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    # HF EsmEmbeddings fidelity: ESM-style token dropout rescales embeddings
    # by (1-0.12)/(1-observed mask ratio) with <mask> embeds zeroed, and pad
    # positions are zeroed (both affect only imported-weight numerics; pads
    # are masked out of attention anyway).
    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id)
        h = jnp.where(is_mask[..., None], 0.0, h)
        src_len = jnp.maximum(attention_mask.sum(-1), 1).astype(jnp.float32)
        observed = is_mask.sum(-1).astype(jnp.float32) / src_len
        h = h * ((1.0 - 0.15 * 0.8) / (1.0 - observed))[:, None, None].astype(dtype)
    h = h * attention_mask[..., None].astype(dtype)
    positions = L.positions_from_mask(attention_mask)

    a8 = cfg.act_int8

    def body(h, lp):
        x = L.layernorm(lp["ln1"], h, cfg.norm_eps)
        q, k, v = L.qkv_proj(lp["attn"], x, dtype,
                             cfg.num_heads * cfg.head_dim,
                             cfg.num_heads * cfg.head_dim, act8=a8)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)
        q = L.apply_rope(q, positions, cfg.rope_theta)
        k = L.apply_rope(k, positions, cfg.rope_theta)
        a = attention(q, k, v, kv_mask=attention_mask, causal=False, impl=cfg.attention_impl)
        h = h + L.dense(lp["attn"]["o"], a.reshape(b, t, -1), dtype, None, a8)
        x = L.layernorm(lp["ln2"], h, cfg.norm_eps)
        mlp = L.swiglu if cfg.use_swiglu else L.gelu_mlp
        h = h + mlp(lp["mlp"], x, dtype, None, a8)
        return h, None

    body_fn = L.remat(body, cfg)
    h, _ = jax.lax.scan(body_fn, h, params["layers"])
    return L.layernorm(params["final_norm"], h, cfg.norm_eps)
