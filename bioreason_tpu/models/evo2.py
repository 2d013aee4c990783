"""Evo2/StripedHyena-style hybrid DNA encoder, TPU-first.

Stands in for the reference's `evo2.Evo2` CUDA/FP8 encoder
(dna_llm.py:86-90, SURVEY §2.2): a causal byte-level DNA LM mixing gated
convolution (hyena) blocks with periodic rotary-attention blocks
("striped" pattern, one attention layer every `attn_every` layers).

Hyena operator here (TPU-friendly explicit-filter form):
    x1, x2, v = proj(u)            # each short-conv'd (depthwise, len 3)
    y  = x1 * depthwise_causal_conv(x2 * v, medium_filter)   # len 128 filter
    out = out_proj(y)
Depthwise causal convs map onto XLA's conv lowering, keeping the op
MXU/VPU-bound instead of FFT-bound; this trades Evo2's implicit long filters
for explicit medium filters, which covers the ±1k-nt windows this framework
feeds it (reference truncates DNA to ~2k tokens anyway — SURVEY §5
long-context notes).

The named-layer embedding tap (`blocks.20.mlp.l3`, dna_llm.py:127-146) maps
to `cfg.embedding_tap_layer`: hyena_forward returns that block's hidden state
instead of the final one when set >= 0.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from bioreason_tpu.config import HyenaConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.attention import attention


def _conv_filter_init(rng, channels: int, length: int):
    # decaying random causal filter, normalized
    decay = jnp.exp(-jnp.arange(length, dtype=jnp.float32) / max(length / 4, 1.0))
    base = jax.random.normal(rng, (channels, length), jnp.float32) * 0.02
    return base * decay[None, :]


def init_hyena(rng, cfg: HyenaConfig) -> Dict:
    keys = jax.random.split(rng, cfg.num_layers + 1)
    d = cfg.hidden_size

    def init_block(k, layer_idx: int):
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(k, 7)
        block: Dict = {"ln1": L.rmsnorm_init(d), "ln2": L.rmsnorm_init(d),
                       "mlp": L.swiglu_init(k5, d, cfg.intermediate_size)}
        if (layer_idx + 1) % cfg.attn_every == 0:
            block["attn"] = {
                "q": L.dense_init(k1, d, d), "k": L.dense_init(k2, d, d),
                "v": L.dense_init(k3, d, d), "o": L.dense_init(k4, d, d),
            }
        else:
            block["hyena"] = {
                "in_proj": L.dense_init(k1, d, 3 * d),
                "short_filter": _conv_filter_init(k6, 3 * d, cfg.short_filter_len),
                "medium_filter": _conv_filter_init(k7, d, cfg.medium_filter_len),
                "filter_bias": jnp.zeros((d,), jnp.float32),
                "out_proj": L.dense_init(k4, d, d),
            }
        return block

    return {
        "embed": L.embed_init(keys[0], cfg.vocab_size, d),
        "blocks": [init_block(keys[i + 1], i) for i in range(cfg.num_layers)],
        "final_norm": L.rmsnorm_init(d),
    }


def _depthwise_causal_conv(x: jnp.ndarray, filt: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, C], filt [C, K] -> causal depthwise conv, same length."""
    k = filt.shape[-1]
    x_padded = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    # conv_general_dilated with feature_group_count=C does depthwise
    out = jax.lax.conv_general_dilated(
        x_padded.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :],  # NCHW (H=1)
        filt.astype(jnp.float32)[:, None, None, :],                      # OIHW, I=1
        window_strides=(1, 1), padding="VALID",
        feature_group_count=filt.shape[0])
    return out[:, :, 0, :].transpose(0, 2, 1).astype(x.dtype)


def _hyena_block(block: Dict, h: jnp.ndarray, cfg: HyenaConfig,
                 mask: jnp.ndarray) -> jnp.ndarray:
    dtype = h.dtype
    d = cfg.hidden_size
    x = L.rmsnorm(block["ln1"], h, cfg.norm_eps)
    x = x * mask[..., None].astype(dtype)          # zero out pads for the convs
    u = L.dense(block["hyena"]["in_proj"], x, dtype)            # [B,T,3D]
    u = _depthwise_causal_conv(u, block["hyena"]["short_filter"])
    x1, x2, v = jnp.split(u, 3, axis=-1)
    inner = _depthwise_causal_conv(x2 * v, block["hyena"]["medium_filter"])
    inner = inner + (x2 * v) * block["hyena"]["filter_bias"].astype(dtype)
    y = jax.nn.silu(x1) * inner
    return h + L.dense(block["hyena"]["out_proj"], y, dtype)


def _attn_block(block: Dict, h: jnp.ndarray, cfg: HyenaConfig,
                mask: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    dtype = h.dtype
    b, t, _ = h.shape
    x = L.rmsnorm(block["ln1"], h, cfg.norm_eps)
    q = L.dense(block["attn"]["q"], x, dtype).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = L.dense(block["attn"]["k"], x, dtype).reshape(b, t, cfg.num_heads, cfg.head_dim)
    v = L.dense(block["attn"]["v"], x, dtype).reshape(b, t, cfg.num_heads, cfg.head_dim)
    q = L.apply_rope(q, positions, cfg.rope_theta)
    k = L.apply_rope(k, positions, cfg.rope_theta)
    a = attention(q, k, v, kv_mask=mask, causal=True, impl=cfg.attention_impl)
    return h + L.dense(block["attn"]["o"], a.reshape(b, t, -1), dtype)


def hyena_forward(params: Dict, cfg: HyenaConfig, input_ids: jnp.ndarray,
                  attention_mask: Optional[jnp.ndarray] = None,
                  tap_layer: Optional[int] = None) -> jnp.ndarray:
    """Returns hidden states [B, T, H]; from `tap_layer` (or
    cfg.embedding_tap_layer) when set >= 0, else the final norm output."""
    dtype = jnp.dtype(cfg.dtype)
    h = L.embed(params["embed"], input_ids, dtype)
    b, t, _ = h.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    positions = L.positions_from_mask(attention_mask)
    tap = cfg.embedding_tap_layer if tap_layer is None else tap_layer

    tapped = None
    for i, block in enumerate(params["blocks"]):
        def run(h, block=block):
            if "attn" in block:
                h = _attn_block(block, h, cfg, attention_mask, positions)
            else:
                h = _hyena_block(block, h, cfg, attention_mask)
            x = L.rmsnorm(block["ln2"], h, cfg.norm_eps)
            return h + L.swiglu(block["mlp"], x, dtype)
        h = jax.checkpoint(run)(h) if cfg.remat else run(h)
        if tap is not None and tap >= 0 and i == tap:
            tapped = h
    if tapped is not None:
        return tapped
    return L.rmsnorm(params["final_norm"], h, cfg.norm_eps)
