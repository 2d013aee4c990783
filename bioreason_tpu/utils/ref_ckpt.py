"""Reference-format SFT checkpoint ingestion (BioReason torch checkpoints).

The reference GRPO entry accepts three SFT-checkpoint formats
(reason.py:422-540):
  1. a PEFT adapter dir  -> load adapters, `merge_and_unload` into the base;
  2. a Lightning/DeepSpeed state dict (`state_dict` / `module` container,
     `_forward_module.` prefixes, `text_model` <-> `text_model.base_model.
     model` PEFT-wrapper remapping, `...base_layer.weight` /
     `...lora_A.weight` keys);
  3. a raw `DNALLMModel.state_dict()` file.

This module ingests all three into the repo's functional param tree so a
real BioReason `pytorch_model.bin` can seed GRPO here
(`cli/reason.py --sft_checkpoint <file-or-dir>`). LoRA weights found in the
checkpoint are MERGED into the base kernels (W += scale * A @ B), matching
the reference's `merge_and_unload` before GRPO re-attaches fresh adapters.

`export_reference_sft` is the inverse (repo tree -> reference-layout flat
dict) used for the byte-level round-trip test and torch interop.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from bioreason_tpu.config import FusionConfig
from bioreason_tpu.utils.hf_import import (export_decoder_to_hf,
                                           import_esm, import_qwen3,
                                           load_hf_state_dict)

_STRIP_PREFIXES = ("_forward_module.", "=model.")
_COMPONENTS = ("text_model.", "dna_model.", "dna_projection.")


def _normalize_key(k: str) -> Optional[str]:
    """Reference key -> '<component>.<hf-key>' with wrappers stripped, or
    None for keys that belong to neither tower (optimizer stats etc.)."""
    for p in _STRIP_PREFIXES:
        if k.startswith(p):
            k = k[len(p):]
    # Lightning module attribute (DNALLMFineTuner.model = DNALLMModel):
    # strip ONE leading 'model.' only when a component marker follows —
    # Qwen3's own keys also start with 'model.'
    if k.startswith("model.") and k[len("model."):].startswith(_COMPONENTS):
        k = k[len("model."):]
    # PEFT wrapper: text_model.base_model.model.<hf> -> text_model.<hf>
    # (reason.py:492-500 remaps in both directions)
    k = k.replace("text_model.base_model.model.", "text_model.")
    if not k.startswith(_COMPONENTS):
        return None
    return k


def _merge_peft_layers(sub: Dict[str, np.ndarray],
                       scale: float) -> Dict[str, np.ndarray]:
    """Fold PEFT artifacts in an HF-format state dict:
    `X.base_layer.weight` -> `X.weight`, and LoRA pairs merged as
    W += scale * (B @ A)  (torch convention: W [out,in], A [r,in], B [out,r]).
    The reference's `merge_and_unload` (reason.py:446) does the same before
    GRPO."""
    out: Dict[str, np.ndarray] = {}
    lora_a: Dict[str, np.ndarray] = {}
    lora_b: Dict[str, np.ndarray] = {}
    pat = re.compile(r"(.+)\.lora_(A|B)(?:\.default)?\.weight$")
    for k, v in sub.items():
        m = pat.match(k)
        if m:
            (lora_a if m.group(2) == "A" else lora_b)[m.group(1)] = v
            continue
        out[k.replace(".base_layer.weight", ".weight")
             .replace(".base_layer.bias", ".bias")] = v
    for mod, a in lora_a.items():
        b = lora_b.get(mod)
        if b is None:
            continue
        w_key = f"{mod}.weight"
        if w_key in out:
            out[w_key] = out[w_key] + scale * (b @ a)
    return out


def _peft_scale(path: str) -> float:
    """lora_alpha / r from adapter_config.json when present (the repo's
    reference artifact ships r=64, alpha=64 -> 1.0)."""
    cfg_path = os.path.join(path, "adapter_config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        r = c.get("r") or c.get("lora_r") or 1
        alpha = c.get("lora_alpha", r)
        return float(alpha) / float(r)
    return 1.0


def split_reference_state(state: Dict[str, np.ndarray],
                          lora_scale: float = 1.0
                          ) -> Dict[str, Dict[str, np.ndarray]]:
    """Flat reference state dict -> per-component HF-format dicts
    {'text_model': ..., 'dna_model': ..., 'dna_projection': ...} with all
    Lightning/DeepSpeed/PEFT wrappers stripped and LoRA merged."""
    comps: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        nk = _normalize_key(k)
        if nk is None:
            continue
        comp, sub = nk.split(".", 1)
        comps.setdefault(comp, {})[sub] = np.asarray(v)
    if "text_model" in comps:
        comps["text_model"] = _merge_peft_layers(comps["text_model"],
                                                 lora_scale)
    return comps


def load_reference_sft(path: str, fusion_cfg: FusionConfig,
                       dtype=np.float32) -> Dict:
    """Reference SFT checkpoint (file or dir, any of the three formats) ->
    repo fusion param tree {'decoder', 'encoder'?, 'dna_projection'?} with
    LoRA merged (reason.py:422-540 semantics). The caller (GRPO) attaches
    fresh adapters on top, exactly like the reference's `_prep_for_training`
    after its load."""
    if os.path.isdir(path):
        if os.path.isfile(os.path.join(path, "adapter_config.json")):
            raise ValueError(
                "bare PEFT adapter dirs carry no base weights; merge them "
                "with apply_peft_adapter(params, adapter_dir) against a "
                "loaded base model instead")
        state = load_hf_state_dict(path)
        scale = _peft_scale(path)
    else:
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(ckpt, dict) and "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]          # Lightning container
        elif isinstance(ckpt, dict) and "module" in ckpt:
            ckpt = ckpt["module"]              # DeepSpeed container
        state = {k: v.float().numpy() for k, v in ckpt.items()
                 if hasattr(v, "numpy")}
        scale = 1.0

    comps = split_reference_state(state, lora_scale=scale)
    if "text_model" not in comps:
        raise KeyError(
            f"no text_model.* keys found; sample keys: {list(state)[:5]}")
    params: Dict = {
        "decoder": import_qwen3(comps["text_model"], fusion_cfg.decoder,
                                dtype=dtype)}
    if "dna_model" in comps:
        params["encoder"] = import_esm(comps["dna_model"], dtype=dtype)
    if "dna_projection" in comps:
        proj = comps["dna_projection"]
        params["dna_projection"] = {
            "kernel": proj["weight"].T.astype(dtype),   # torch [out,in]
            "bias": proj["bias"].astype(dtype),
        }
    return params


def apply_peft_adapter(decoder_params: Dict, adapter_dir: str,
                       dtype=np.float32) -> Dict:
    """Reference format #1 (PEFT dir, reason.py:432-447): merge a saved
    adapter (adapter_model.safetensors/bin) into an existing decoder tree —
    the functional `merge_and_unload`. Returns a new tree."""
    import copy
    state = load_hf_state_dict(adapter_dir)
    scale = _peft_scale(adapter_dir)
    pat = re.compile(
        r"base_model\.model\.model\.layers\.(\d+)\.(.+?)\.lora_(A|B)"
        r"(?:\.default)?\.weight$")
    pairs: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        m = pat.match(k)
        if not m:
            continue
        pairs.setdefault((int(m.group(1)), m.group(2)), {})[m.group(3)] = (
            np.asarray(v))
    out = copy.deepcopy(decoder_params)
    name_map = {"self_attn.q_proj": ("attn", "q"), "self_attn.k_proj": ("attn", "k"),
                "self_attn.v_proj": ("attn", "v"), "self_attn.o_proj": ("attn", "o"),
                "mlp.gate_proj": ("mlp", "gate"), "mlp.up_proj": ("mlp", "up"),
                "mlp.down_proj": ("mlp", "down")}
    for (i, mod), ab in pairs.items():
        if "A" not in ab or "B" not in ab or mod not in name_map:
            continue
        grp, leaf = name_map[mod]
        kern = out["layers"][grp][leaf]["kernel"]
        delta = (scale * (ab["B"] @ ab["A"])).T.astype(kern.dtype)  # [in,out]
        kern = np.asarray(kern).copy()
        kern[i] = kern[i] + delta
        out["layers"][grp][leaf]["kernel"] = kern
    return out


def export_reference_sft(params: Dict, fusion_cfg: FusionConfig,
                         lightning: bool = False) -> Dict[str, np.ndarray]:
    """Repo fusion tree -> reference DNALLMModel.state_dict() layout
    (text_model.* HF Qwen3 keys, dna_model.* HF ESM keys,
    dna_projection.*). `lightning=True` adds the `_forward_module.model.`
    prefix a DeepSpeed-Lightning dump carries. Round-trips bit-identically
    through load_reference_sft."""
    out: Dict[str, np.ndarray] = {}
    for k, v in export_decoder_to_hf(params["decoder"],
                                     fusion_cfg.decoder).items():
        out[f"text_model.{k}"] = v
    if "encoder" in params:
        for k, v in export_encoder_to_hf(params["encoder"]).items():
            out[f"dna_model.{k}"] = v
    if "dna_projection" in params:
        out["dna_projection.weight"] = np.asarray(
            params["dna_projection"]["kernel"]).T
        out["dna_projection.bias"] = np.asarray(
            params["dna_projection"]["bias"])
    if lightning:
        out = {f"_forward_module.model.{k}": v for k, v in out.items()}
    return out


def export_encoder_to_hf(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of import_esm: encoder tree -> HF EsmForMaskedLM keys with
    the NT-v2 fused-GLU layout (gate/up re-concatenated into one
    `intermediate.dense` of width 2*I)."""
    out: Dict[str, np.ndarray] = {}
    out["esm.embeddings.word_embeddings.weight"] = np.asarray(
        params["embed"]["embedding"])
    fn = params["final_norm"]
    out["esm.encoder.emb_layer_norm_after.weight"] = np.asarray(fn["scale"])
    out["esm.encoder.emb_layer_norm_after.bias"] = np.asarray(fn["bias"])
    layers = params["layers"]
    n = np.asarray(layers["ln1"]["scale"]).shape[0]

    def put(i, hf, arr, transpose):
        out[f"esm.encoder.layer.{i}.{hf}"] = (arr.T if transpose else arr)

    fused = "gate" in layers["mlp"]
    for i in range(n):
        def g(path):
            node = _walk(layers, path)
            return None if node is None else np.asarray(node)[i]

        def put_opt(hf, path, transpose):
            arr = g(path)
            if arr is not None:
                put(i, hf, arr, transpose)

        put_opt("attention.self.query.weight", "attn/q/kernel", True)
        put_opt("attention.self.query.bias", "attn/q/bias", False)
        put_opt("attention.self.key.weight", "attn/k/kernel", True)
        put_opt("attention.self.key.bias", "attn/k/bias", False)
        put_opt("attention.self.value.weight", "attn/v/kernel", True)
        put_opt("attention.self.value.bias", "attn/v/bias", False)
        put_opt("attention.output.dense.weight", "attn/o/kernel", True)
        put_opt("attention.output.dense.bias", "attn/o/bias", False)
        put_opt("attention.LayerNorm.weight", "ln1/scale", False)
        put_opt("attention.LayerNorm.bias", "ln1/bias", False)
        if fused:
            w = np.concatenate([g("mlp/gate/kernel"), g("mlp/up/kernel")],
                               axis=-1)
            gb, ub = g("mlp/gate/bias"), g("mlp/up/bias")
            b = (np.concatenate([gb, ub], axis=-1)
                 if gb is not None and ub is not None else None)
        else:
            w, b = g("mlp/up/kernel"), g("mlp/up/bias")
        put(i, "intermediate.dense.weight", w, True)
        if b is not None:
            put(i, "intermediate.dense.bias", b, False)
        put_opt("output.dense.weight", "mlp/down/kernel", True)
        put_opt("output.dense.bias", "mlp/down/bias", False)
        put_opt("LayerNorm.weight", "ln2/scale", False)
        put_opt("LayerNorm.bias", "ln2/bias", False)
    return out


def _walk(tree: Dict, path: str):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node
