"""LoRA as a pure pytree transform.

The reference uses PEFT `get_peft_model` over all linear layers of the text
tower, excluding lm_head/embeddings and anything named 'dna'
(train_dna_qwen.py:103-177, grpo_trainer.py:262-289). Here LoRA is three
tree operations:

  * `attach_lora`  — add `lora_a` (gaussian) / `lora_b` (zeros) /
    `lora_scale` leaves next to every targeted `kernel`; the dense layers in
    models/layers.py pick them up automatically, computing
    y = x@W + (x@A)@B * alpha/r.
  * `merge_lora`   — fold a@b*scale into the kernels and drop the adapter
    leaves (PEFT merge_and_unload; used for checkpoint export and the
    vLLM-style weight sync in the reference demo_grpo.py:489-518).
  * `strip_lora`   — drop adapter leaves without merging: evaluating the
    stripped tree IS the reference policy ("adapter disabled" trick the GRPO
    trainer uses for ref logps, grpo_trainer.py:635-637).

Stacked decoder kernels [L, in, out] get stacked adapters
([L, in, r], [L, r, out]) so lax.scan still sees one leaf per layer stack.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from bioreason_tpu.config import LoRAConfig


def _is_excluded(path: str, cfg: LoRAConfig) -> bool:
    return any(pat in path for pat in cfg.exclude_patterns)


def attach_lora(rng, params: Dict, cfg: LoRAConfig) -> Dict:
    """Returns a new tree with adapter leaves attached to targeted kernels."""
    counter = [0]

    def walk(node, path):
        if isinstance(node, dict):
            out = {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
            kern = node.get("kernel")
            if (kern is not None and hasattr(kern, "ndim") and kern.ndim in (2, 3)
                    and not _is_excluded(path, cfg)):
                counter[0] += 1
                k = jax.random.fold_in(rng, counter[0])
                scale = cfg.alpha / cfg.r
                if kern.ndim == 3:
                    # stacked [L, in, out] kernels (scan-over-layers): adapters
                    # and scale carry the leading layer axis so lax.scan can
                    # slice them per layer
                    l, i, o = kern.shape
                    a = jax.random.normal(k, (l, i, cfg.r), jnp.float32) * (1.0 / cfg.r)
                    b = jnp.zeros((l, cfg.r, o), jnp.float32)
                    out["lora_scale"] = jnp.full((l,), scale, jnp.float32)
                else:
                    i, o = kern.shape
                    a = jax.random.normal(k, (i, cfg.r), jnp.float32) * (1.0 / cfg.r)
                    b = jnp.zeros((cfg.r, o), jnp.float32)
                    out["lora_scale"] = jnp.asarray(scale, jnp.float32)
                out["lora_a"], out["lora_b"] = a, b
            return out
        return node

    return walk(params, "")


def _fold(node: Dict):
    kern = node["kernel"]
    a, b = node["lora_a"], node["lora_b"]
    scale = node["lora_scale"]
    if kern.ndim == 3:
        delta = jnp.einsum("lir,lro->lio", a, b) * scale[:, None, None]
    else:
        delta = (a @ b) * scale
    return kern + delta.astype(kern.dtype)


def merge_lora(params: Dict) -> Dict:
    """Fold adapters into kernels, dropping adapter leaves."""
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items() if not k.startswith("lora_")}
            if "lora_a" in node:
                out["kernel"] = _fold(node)
            return out
        return node
    return walk(params)


def strip_lora(params: Dict) -> Dict:
    """Drop adapter leaves WITHOUT merging (reference policy / adapter-off)."""
    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items() if not k.startswith("lora_")}
        return node
    return walk(params)


def lora_zero_like(params: Dict) -> Dict:
    """Zero out lora_b everywhere (re-init adapters to identity behavior)."""
    def walk(node):
        if isinstance(node, dict):
            return {k: (jnp.zeros_like(v) if k == "lora_b" else walk(v))
                    for k, v in node.items()}
        return node
    return walk(params)
