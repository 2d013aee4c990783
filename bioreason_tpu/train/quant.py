"""Int8 storage for frozen tower weights (QLoRA-style memory trade).

The reference's bitsandbytes dependency (`prepare_model_for_kbit_training`,
train_dna_qwen.py:166 / reason.py:387) is a no-op in practice — models load
bf16 — but the capability it gestures at matters on a 16 GB v5e chip:
frozen base kernels stored int8 with per-output-channel scales halve the
resident tower memory vs bf16, which is what fits the Qwen3-4B-class
decoder + NT-500M encoder on one chip.

`quantize_frozen_int8` rewrites every eligible frozen `kernel` leaf to a
{"q": int8 [.., in, out], "scale": f32 [.., 1, out]} subtree; the dense
layer (models/layers.py:dense) dequantizes to the compute dtype inside the
layer scan, so peak HBM holds one layer's bf16 copy. LoRA adapters (fp32)
attach BEFORE quantization and train as usual — the QLoRA recipe.

Quantization error: per-channel absmax symmetric int8 gives ~0.3% RMS
weight error; fine for frozen towers under adapter fine-tuning, NOT for
towers you intend to train (`freeze_encoder=False` + int8 raises).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def quantize_kernel_int8(w, xp=np) -> Dict:
    """[.., in, out] float kernel -> {"q": int8, "scale": f32 [.., 1, out]}
    (symmetric per-output-channel absmax over the input axis).

    `xp=jnp` runs the quantization ON DEVICE (jit-able pure function) —
    used by the GRPO rollout-int8 path where weights already live in HBM."""
    w = xp.asarray(w, xp.float32)
    scale = xp.abs(w).max(axis=-2, keepdims=True) / 127.0
    scale = xp.maximum(scale, 1e-12)
    q = xp.clip(xp.rint(w / scale), -127, 127).astype(xp.int8)
    return {"q": jnp.asarray(q), "scale": jnp.asarray(scale).astype(jnp.float32)}


def quantize_embedding_int8(e, xp=np) -> Dict:
    """[V, H] embedding -> {"q": int8 [V,H], "scale": f32 [V,1]} (per-vocab-row
    absmax). Serves both the gather (embed lookup) and the tied-logits matmul
    (scale applied per vocab channel AFTER the dot) — see layers.embed /
    layers.lm_logits."""
    e = xp.asarray(e, xp.float32)
    scale = xp.abs(e).max(axis=-1, keepdims=True) / 127.0
    scale = xp.maximum(scale, 1e-12)
    q = xp.clip(xp.rint(e / scale), -127, 127).astype(xp.int8)
    return {"q": jnp.asarray(q), "scale": jnp.asarray(scale).astype(jnp.float32)}


def dequantize_kernel(node, dtype=jnp.float32):
    return node["q"].astype(dtype) * node["scale"].astype(dtype)


def quantize_frozen_int8(params: Dict, subtrees=("decoder", "encoder"),
                         include_embed: bool = False, xp=np) -> Dict:
    """Quantize every `kernel` leaf (ndim>=2) under the given frozen
    subtrees. Norms, biases, LoRA adapters and the trainable dna_projection
    stay float.

    `include_embed=True` additionally quantizes the decoder embedding and
    lm_head (per-vocab-row / per-channel scales) — the SERVING configuration:
    every weight byte the decode loop streams is int8. Keep it False for
    TRAINING trees (the fused-CE loss consumes a float head)."""
    def walk(node, in_decoder: bool):
        if isinstance(node, list):
            return [walk(x, in_decoder) for x in node]   # evo2 blocks
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "lm_head":
                out[k] = ({"kernel": quantize_kernel_int8(v["kernel"], xp)}
                          if include_embed else v)
            elif k == "embed" and in_decoder and include_embed:
                out[k] = {"embedding": quantize_embedding_int8(v["embedding"], xp)}
            elif (k == "kernel" and not isinstance(v, dict)
                    and hasattr(v, "ndim") and v.ndim >= 2):
                out[k] = quantize_kernel_int8(v, xp)
            elif (k == "experts" and isinstance(v, dict)
                    and all(not isinstance(w, dict) for w in v.values())):
                # MoE expert banks [E, in, out] (layers.moe_init): quantize
                # per-(expert, out-channel) — axis -2 absmax gives [E,1,out]
                out[k] = {name: quantize_kernel_int8(w, xp)
                          for name, w in v.items()}
            else:
                out[k] = walk(v, in_decoder)
        return out

    out = dict(params)
    for name in subtrees:
        if name in out:
            out[name] = walk(out[name], in_decoder=(name == "decoder"))
    return out
