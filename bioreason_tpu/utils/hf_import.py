"""Import HuggingFace checkpoints into bioreason_tpu param trees.

The reference loads pretrained towers straight from HF hub
(dna_llm.py:64-90). This environment has no network access, so import works
from LOCAL safetensors/torch files: point it at a downloaded Qwen3 or NT-v2
directory and it produces the stacked param pytree the models here consume
(HF [out,in] kernels transposed to [in,out], per-layer tensors stacked along
the leading scan axis).

`import_qwen3` covers the Qwen3 family exactly. `import_with_map` is the
generic engine: a list of (regex -> path-template) rules over the flat HF
state dict, used for NT-v2/ESM variants whose remote-code naming differs per
checkpoint.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterable, List, Tuple

import numpy as np

from bioreason_tpu.config import DecoderConfig


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a local HF checkpoint dir (safetensors preferred,
    torch .bin fallback)."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for key in sf.keys():
                    tensors[key] = sf.get_tensor(key)
        return tensors
    bin_files = sorted(f for f in os.listdir(path)
                       if (f.endswith(".bin") and f.startswith("pytorch_model"))
                       or f.endswith(".pt"))           # evo2/vortex ship .pt
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin/pt weights in {path}")
    import torch
    for f in bin_files:
        sd = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        for k, v in sd.items():
            # vortex Evo2 stores implicit-filter poles/residues as COMPLEX
            # tensors; .float() would silently drop the imaginary part
            tensors[k] = (v.numpy() if v.is_complex() else v.float().numpy())
    return tensors


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _stack_layers(per_layer: Dict[int, np.ndarray]) -> np.ndarray:
    n = max(per_layer) + 1
    return np.stack([per_layer[i] for i in range(n)], axis=0)


def import_qwen3(state: Dict[str, np.ndarray], cfg: DecoderConfig,
                 dtype=np.float32) -> Dict:
    """HF Qwen3 state dict -> decoder param tree (models/qwen3.py layout)."""
    def get(k):
        return state[k].astype(dtype)

    layered: Dict[str, Dict[int, np.ndarray]] = {}

    def put_layer(dst: str, i: int, arr: np.ndarray):
        layered.setdefault(dst, {})[i] = arr

    params: Dict = {}
    _set(params, "embed/embedding", get("model.embed_tokens.weight"))
    _set(params, "final_norm/scale", get("model.norm.weight"))
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        _set(params, "lm_head/kernel", get("lm_head.weight").T)

    pat = re.compile(r"model\.layers\.(\d+)\.(.+)")
    mapping = {
        "self_attn.q_proj.weight": ("attn/q/kernel", True),
        "self_attn.k_proj.weight": ("attn/k/kernel", True),
        "self_attn.v_proj.weight": ("attn/v/kernel", True),
        "self_attn.o_proj.weight": ("attn/o/kernel", True),
        "self_attn.q_norm.weight": ("attn/q_norm/scale", False),
        "self_attn.k_norm.weight": ("attn/k_norm/scale", False),
        "input_layernorm.weight": ("ln1/scale", False),
        "post_attention_layernorm.weight": ("ln2/scale", False),
        "mlp.gate_proj.weight": ("mlp/gate/kernel", True),
        "mlp.up_proj.weight": ("mlp/up/kernel", True),
        "mlp.down_proj.weight": ("mlp/down/kernel", True),
    }
    # Qwen3-MoE sparse FFN (Qwen3MoeForCausalLM: router `mlp.gate.weight`
    # [E,H], per-expert `mlp.experts.{j}.{gate,up,down}_proj.weight`);
    # experts stack onto a leading E axis -> layers/mlp/experts/{gate,up,down}
    moe_pat = re.compile(r"mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight")
    experts: Dict[str, Dict[int, Dict[int, np.ndarray]]] = {}

    for key in state:
        m = pat.match(key)
        if not m:
            continue
        i, sub = int(m.group(1)), m.group(2)
        if sub == "mlp.gate.weight":                 # MoE router
            put_layer("mlp/router/kernel", i, get(key).T)
            continue
        em = moe_pat.fullmatch(sub)
        if em:
            j, proj = int(em.group(1)), em.group(2)
            experts.setdefault(proj, {}).setdefault(i, {})[j] = get(key).T
            continue
        if sub not in mapping:
            continue
        dst, transpose = mapping[sub]
        arr = get(key)
        put_layer(dst, i, arr.T if transpose else arr)

    for proj, per_layer in experts.items():
        for i, per_expert in per_layer.items():
            put_layer(f"mlp/experts/{proj}", i, _stack_layers(per_expert))

    layers: Dict = {}
    for dst, per_layer in layered.items():
        _set(layers, dst, _stack_layers(per_layer))
    params["layers"] = layers
    return params


MapRule = Tuple[str, str, bool]  # (regex with (?P<i>...) , dst template, transpose)

# Rules for HF ESM-family checkpoints (EsmForMaskedLM / EsmModel — the NT-v2
# architecture, reference dna_llm.py:79-83). The `esm.` prefix is optional so
# bare EsmModel state dicts match too. Covers the full bias surface (q/k/v/o,
# attention output, MLP denses, LayerNorms). NT-v2's remote code fuses the
# gated MLP into one `intermediate.dense` of width 2*I (silu(x1)*x2 over the
# chunk halves); `import_esm` splits that into gate/up after mapping.
_P = r"(?:esm\.)?"
ESM_RULES: List[MapRule] = [
    (_P + r"embeddings\.word_embeddings\.weight", "embed/embedding", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.query\.weight", "layers/attn/q/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.query\.bias", "layers/attn/q/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.key\.weight", "layers/attn/k/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.key\.bias", "layers/attn/k/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.value\.weight", "layers/attn/v/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.self\.value\.bias", "layers/attn/v/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.output\.dense\.weight", "layers/attn/o/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.output\.dense\.bias", "layers/attn/o/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.LayerNorm\.weight", "layers/ln1/scale", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.attention\.LayerNorm\.bias", "layers/ln1/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.intermediate\.dense\.weight", "layers/mlp/up/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.intermediate\.dense\.bias", "layers/mlp/up/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.gate\.dense\.weight", "layers/mlp/gate/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.gate\.dense\.bias", "layers/mlp/gate/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.output\.dense\.weight", "layers/mlp/down/kernel", True),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.output\.dense\.bias", "layers/mlp/down/bias", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.LayerNorm\.weight", "layers/ln2/scale", False),
    (_P + r"encoder\.layer\.(?P<i>\d+)\.LayerNorm\.bias", "layers/ln2/bias", False),
    (_P + r"encoder\.emb_layer_norm_after\.weight", "final_norm/scale", False),
    (_P + r"encoder\.emb_layer_norm_after\.bias", "final_norm/bias", False),
]
NT_V2_RULES = ESM_RULES  # backward-compatible alias


def import_esm(state: Dict[str, np.ndarray], dtype=np.float32) -> Dict:
    """HF ESM/NT-v2 state dict -> encoder param tree (models/nt_encoder.py).

    Handles both MLP layouts: a fused gated `intermediate.dense` of width
    2*intermediate (NT-v2 remote code: silu(first half) * second half) is
    split into gate/up; separate gate.dense keys or a plain gelu MLP map
    directly. Presence of the resulting `gate` subtree tells the caller to
    set EncoderConfig.use_swiglu."""
    params = import_with_map(state, ESM_RULES, dtype)
    if "layers" not in params or "embed" not in params:
        raise KeyError("state dict does not look like an ESM checkpoint "
                       f"(keys: {list(state)[:5]}...)")
    mlp = params["layers"]["mlp"]
    inter_out = mlp["up"]["kernel"].shape[-1]      # [L, H, I or 2I]
    down_in = mlp["down"]["kernel"].shape[1]       # [L, I, H]
    if "gate" not in mlp and inter_out == 2 * down_in:
        gate, up = {}, {}
        for leaf in list(mlp["up"]):
            gate[leaf], up[leaf] = np.split(mlp["up"][leaf], 2, axis=-1)
        mlp["gate"], mlp["up"] = gate, up
    elif "gate" not in mlp and inter_out != down_in:
        raise ValueError(f"cannot infer MLP layout: intermediate width {inter_out} "
                         f"vs down-projection input {down_in}")
    return params


def import_with_map(state: Dict[str, np.ndarray], rules: Iterable[MapRule],
                    dtype=np.float32, strict: bool = False) -> Dict:
    """Generic regex-driven importer. Per-layer matches (rules whose regex
    captures group 'i') are stacked along a leading layer axis."""
    params: Dict = {}
    layered: Dict[str, Dict[int, np.ndarray]] = {}
    unmatched = []
    compiled = [(re.compile(rx), dst, t) for rx, dst, t in rules]
    for key, arr in state.items():
        hit = False
        for rx, dst, transpose in compiled:
            m = rx.fullmatch(key)
            if not m:
                continue
            a = arr.astype(dtype)
            if transpose:
                a = a.T
            if "i" in (m.groupdict() or {}):
                layered.setdefault(dst, {})[int(m.group("i"))] = a
            else:
                _set(params, dst, a)
            hit = True
            break
        if not hit:
            unmatched.append(key)
    for dst, per_layer in layered.items():
        _set(params, dst, _stack_layers(per_layer))
    if strict and unmatched:
        raise KeyError(f"unmatched HF keys: {unmatched[:10]} (+{len(unmatched) - 10})")
    return params


# ---------------------------------------------------------------------------
# Evo2 / StripedHyena-2 (vortex-style checkpoint naming)
# ---------------------------------------------------------------------------

def import_evo2(state: Dict[str, np.ndarray], dtype=np.float32):
    """Vortex/savanna-style Evo2 state dict -> (params, layer_flavors).

    The reference binds to the `evo2` package (dna_llm.py:86-90), whose
    inference stack (vortex) names weights `blocks.N.{pre_norm,projections,
    filter,out_filter_dense,post_norm,mlp.l1/l2/l3}` with attention blocks
    as `blocks.N.inner_mha_cls.{Wqkv,out_proj}`. Per-block operator flavor
    is derived from which filter keys exist: poles/residues -> 'li' (long
    implicit), a decay tensor -> 'mr', plain h -> 'se', Wqkv -> 'attn'.

    Implicit-filter poles arrive as raw complex pairs (real, imag); the JAX
    model stores (logit(|p|), phase) so the materialized magnitude is always
    stable under training (models/evo2.py:_materialize_li_filter) — the
    conversion here is exact for |p| in (0, 1).
    """
    def get(k):
        for cand in (k, "backbone." + k):
            if cand in state:
                return state[cand].astype(dtype)
        raise KeyError(k)

    def has(k):
        return k in state or ("backbone." + k) in state

    def tdense(k):
        return {"kernel": get(k).T}

    params: Dict = {"embed": {"embedding": get("embedding_layer.weight")},
                    "final_norm": {"scale": get("norm.scale")}}
    n_layers = 0
    while has(f"blocks.{n_layers}.pre_norm.scale"):
        n_layers += 1
    if n_layers == 0:
        raise KeyError("no blocks.N.pre_norm.scale keys found")

    blocks, flavors = [], []
    for i in range(n_layers):
        p = f"blocks.{i}"
        block: Dict = {"ln1": {"scale": get(f"{p}.pre_norm.scale")},
                       "ln2": {"scale": get(f"{p}.post_norm.scale")},
                       "mlp": {"gate": tdense(f"{p}.mlp.l1.weight"),
                               "up": tdense(f"{p}.mlp.l2.weight"),
                               "down": tdense(f"{p}.mlp.l3.weight")}}
        if has(f"{p}.inner_mha_cls.Wqkv.weight"):
            wqkv = get(f"{p}.inner_mha_cls.Wqkv.weight")       # [3D, D]
            d = wqkv.shape[1]
            block["attn"] = {
                "q": {"kernel": wqkv[:d].T}, "k": {"kernel": wqkv[d:2 * d].T},
                "v": {"kernel": wqkv[2 * d:].T},
                "o": {"kernel": get(f"{p}.inner_mha_cls.out_proj.weight").T}}
            flavors.append("attn")
        else:
            filt: Dict = {}
            if has(f"{p}.filter.poles"):
                def pairs(k):
                    # real layouts [D,K,1,2]/[D,K,2] (trailing (re,im)) or a
                    # genuinely COMPLEX [D,K]/[D,K,1] tensor (vortex .pt)
                    for cand in (k, "backbone." + k):
                        if cand in state:
                            a = np.asarray(state[cand])
                            break
                    else:
                        raise KeyError(k)
                    if np.iscomplexobj(a):
                        a = a.reshape(a.shape[0], -1)
                        return np.stack([a.real, a.imag], -1).astype(dtype)
                    return a.astype(dtype).reshape(a.shape[0], a.shape[1], 2)
                poles = pairs(f"{p}.filter.poles")
                residues = pairs(f"{p}.filter.residues")
                mag = np.sqrt(poles[..., 0] ** 2 + poles[..., 1] ** 2)
                mag = np.clip(mag, 1e-6, 1 - 1e-6)
                phase = np.arctan2(poles[..., 1], poles[..., 0])
                filt = {"poles": np.stack([np.log(mag / (1 - mag)), phase], -1)
                        .astype(dtype),
                        "residues": residues}
                flavors.append("li")
            elif has(f"{p}.filter.decay"):
                filt = {"h": get(f"{p}.filter.h"),
                        "decay": get(f"{p}.filter.decay")}
                flavors.append("mr")
            else:
                filt = {"h": get(f"{p}.filter.h")}
                flavors.append("se")
            short = get(f"{p}.filter.short_filter_weight")
            block["hyena"] = {
                "in_proj": tdense(f"{p}.projections.weight"),
                "short_filter": short.reshape(short.shape[0], short.shape[-1]),
                "filter": filt,
                "filter_bias": (get(f"{p}.filter.D")
                                if has(f"{p}.filter.D")
                                else np.zeros(get(f"{p}.post_norm.scale").shape,
                                              dtype)),
                "out_proj": tdense(f"{p}.out_filter_dense.weight"),
            }
        blocks.append(block)
    params["blocks"] = blocks
    return params, tuple(flavors)


def export_decoder_to_hf(params: Dict, cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    """Inverse of import_qwen3 (round-trip testing + interop export)."""
    out: Dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = np.asarray(params["embed"]["embedding"])
    out["model.norm.weight"] = np.asarray(params["final_norm"]["scale"])
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"]["kernel"]).T
    layers = params["layers"]
    mapping = {
        "attn/q/kernel": ("self_attn.q_proj.weight", True),
        "attn/k/kernel": ("self_attn.k_proj.weight", True),
        "attn/v/kernel": ("self_attn.v_proj.weight", True),
        "attn/o/kernel": ("self_attn.o_proj.weight", True),
        "attn/q_norm/scale": ("self_attn.q_norm.weight", False),
        "attn/k_norm/scale": ("self_attn.k_norm.weight", False),
        "ln1/scale": ("input_layernorm.weight", False),
        "ln2/scale": ("post_attention_layernorm.weight", False),
        "mlp/gate/kernel": ("mlp.gate_proj.weight", True),
        "mlp/up/kernel": ("mlp.up_proj.weight", True),
        "mlp/down/kernel": ("mlp.down_proj.weight", True),
    }
    for src, (hf_name, transpose) in mapping.items():
        node = layers
        for p in src.split("/")[:-1]:
            node = node[p]
        stacked = np.asarray(node[src.split("/")[-1]])
        for i in range(stacked.shape[0]):
            arr = stacked[i].T if transpose else stacked[i]
            out[f"model.layers.{i}.{hf_name}"] = arr
    return out
