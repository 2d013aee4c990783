"""Fused-projection param layout: concat q/k/v (and gate/up) base kernels.

Why: small-N matmuls underfill the MXU pipeline. Measured on v5e (tools/
probe_int8_mxu.py, serving prefill shapes): a [16384,1024]x[1024,1024] dot
runs ~12 TF/s effective vs ~51 TF/s at N=3072 — per-projection q/k/v dots at
0.6B widths waste most of the MXU. Concatenating the three kernels along the
output axis turns them into ONE [in, q+2kv]-wide dot (and gate+up into one
[in, 2*hidden] dot) with identical math.

This is a ONE-TIME param-tree transform (load/setup time), not a per-step
concat: the fused leaf replaces the per-projection kernels, so there is no
runtime concat traffic and frozen/int8 storage fuses the same way. LoRA
adapter leaves (lora_a/lora_b/lora_scale) stay per-projection next to where
the kernel used to live — `layers.qkv_proj`/`layers.swiglu` add their deltas
to the split outputs, so trainable-path regexes (train/trainable.py) and
checkpoint layouts for ADAPTERS are unchanged. Use for serving and
LoRA-frozen training trees; full-finetune checkpoints written from a fused
tree would carry the fused layout (unfuse before exporting — or don't fuse).

The reference counterpart is torch.nn.Linear fusion as done by vLLM's
QKVParallelLinear/MergedColumnParallelLinear serving layers (the reference
delegates serving to vLLM, grpo_config.py:230-258); training-side fusion has
no reference equivalent (HF Qwen3 keeps separate projections).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def _copy(node):
    if isinstance(node, dict):
        return {k: _copy(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_copy(v) for v in node]
    return node


def _concat_kernels(nodes):
    """Concat kernel leaves along the output axis; supports int8 storage
    dicts ({"q": int8 [..,in,out], "scale": f32 [..,1,out]})."""
    if all(isinstance(n, dict) for n in nodes):
        return {"q": jnp.concatenate([n["q"] for n in nodes], axis=-1),
                "scale": jnp.concatenate([n["scale"] for n in nodes], axis=-1)}
    if any(isinstance(n, dict) for n in nodes):
        raise ValueError("cannot fuse mixed int8/float projection kernels")
    return jnp.concatenate(nodes, axis=-1)


def _fuse_group(parent: Dict, names: Sequence[str], fused_name: str) -> bool:
    """Move base kernel/bias of parent[n] for n in names into ONE fused
    leaf parent[fused_name]; leave LoRA leaves (and anything else) behind.
    Returns False (no-op) when any member lacks a kernel (already fused)."""
    if fused_name in parent:
        return False
    subs = [parent.get(n) for n in names]
    if any(s is None or "kernel" not in s for s in subs):
        return False
    fused = {"kernel": _concat_kernels([s["kernel"] for s in subs])}
    has_bias = ["bias" in s for s in subs]
    if all(has_bias):
        fused["bias"] = jnp.concatenate([s["bias"] for s in subs], axis=-1)
    elif any(has_bias):
        raise ValueError(f"cannot fuse {names}: mixed bias/no-bias")
    parent[fused_name] = fused
    for n in names:
        rest = {k: v for k, v in parent[n].items() if k not in ("kernel", "bias")}
        if rest:
            parent[n] = rest           # LoRA adapter leaves stay addressable
        else:
            del parent[n]
    return True


def _split_kernel(node, sizes):
    """Split a fused kernel leaf back along the output axis; supports int8
    storage dicts."""
    offs = []
    o = 0
    for s in sizes[:-1]:
        o += s
        offs.append(o)
    if isinstance(node, dict):
        qs = jnp.split(node["q"], offs, axis=-1)
        ss = jnp.split(node["scale"], offs, axis=-1)
        return [{"q": q, "scale": s} for q, s in zip(qs, ss)]
    return jnp.split(node, offs, axis=-1)


def _unfuse_group(parent: Dict, names: Sequence[str], fused_name: str,
                  sizes: Sequence[int]) -> bool:
    if fused_name not in parent:
        return False
    fused = parent.pop(fused_name)
    kerns = _split_kernel(fused["kernel"], sizes)
    biases = (jnp.split(fused["bias"],
                        [sum(sizes[:i + 1]) for i in range(len(sizes) - 1)],
                        axis=-1) if "bias" in fused else [None] * len(names))
    for n, k, b in zip(names, kerns, biases):
        sub = dict(parent.get(n) or {})
        sub["kernel"] = k
        if b is not None:
            sub["bias"] = b
        parent[n] = sub
    return True


def unfuse_projections(params: Dict,
                       subtrees: Sequence[str] = ("decoder", "encoder")) -> Dict:
    """Inverse of `fuse_projections`: split qkv -> q/k/v and gateup ->
    gate/up so a fused tree can be exported in the canonical (per-projection)
    checkpoint layout. Output widths are recovered from the `o` projection
    (q out = o in; k/v out = qkv_out - q_out split evenly) and the `down`
    kernel (gate/up are each half of gateup). No-op for unfused trees."""
    out = _copy(params)
    for name in subtrees:
        tower = out.get(name)
        if not isinstance(tower, dict):
            continue
        layers = tower.get("layers")
        if not isinstance(layers, dict):
            continue
        attn = layers.get("attn")
        if isinstance(attn, dict) and "qkv" in attn:
            ok = attn["o"]["kernel"]
            q_out = (ok["q"] if isinstance(ok, dict) else ok).shape[-2]
            fk = attn["qkv"]["kernel"]
            total = (fk["q"] if isinstance(fk, dict) else fk).shape[-1]
            kv = (total - q_out) // 2
            _unfuse_group(attn, ("q", "k", "v"), "qkv", (q_out, kv, kv))
        mlp = layers.get("mlp")
        if isinstance(mlp, dict) and "gateup" in mlp:
            dk = mlp["down"]["kernel"]
            hid = (dk["q"] if isinstance(dk, dict) else dk).shape[-2]
            _unfuse_group(mlp, ("gate", "up"), "gateup", (hid, hid))
    return out


def fuse_projections(params: Dict, subtrees: Sequence[str] = ("decoder", "encoder")) -> Dict:
    """Return a new param tree with q/k/v -> qkv and gate/up -> gateup fused
    under each named subtree's stacked `layers` dict. Trees without that
    structure (e.g. an Evo2 encoder's block list) are left untouched.

    Idempotent: re-fusing a fused tree is a no-op copy."""
    out = _copy(params)
    for name in subtrees:
        tower = out.get(name)
        if not isinstance(tower, dict):
            continue
        layers = tower.get("layers")
        if not isinstance(layers, dict):
            continue                    # evo2 block lists etc.
        attn = layers.get("attn")
        if isinstance(attn, dict):
            _fuse_group(attn, ("q", "k", "v"), "qkv")
        mlp = layers.get("mlp")
        if isinstance(mlp, dict) and "gate" in mlp and "up" in mlp:
            _fuse_group(mlp, ("gate", "up"), "gateup")
    return out
