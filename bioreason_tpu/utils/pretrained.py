"""End-to-end pretrained-checkpoint loading (local HF directories).

The reference's premise is pretrained towers pulled from the HF hub at
model-construction time (/root/reference/bioreason/models/dna_llm.py:64-90:
`AutoModelForCausalLM` Qwen3 + tokenizer + DNA special tokens, and
`AutoModelForMaskedLM` NT-v2 + its tokenizer). This environment has no
network, so the equivalents here consume LOCAL directories laid out the way
`save_pretrained`/`snapshot_download` leave them: `config.json` +
safetensors/bin weights + tokenizer files.

`load_pretrained_fusion` is the one-call replacement for the reference
constructor: it builds the Decoder/Encoder configs from the HF config.json
files, imports the weights into the JAX param layout (utils/hf_import),
loads both tokenizers (DNA special tokens added like dna_llm.py:72-74 — the
reference never resizes the embedding; Qwen3's vocab is padded to 151936 so
the three new ids fit in the slack, which we assert), and fresh-initializes
the dna_projection exactly like the reference's `nn.Linear` (dna_llm.py:97).

Numeric fidelity of the imported towers is pinned by
tests/test_golden_parity.py against the real HF model math.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import DecoderConfig, EncoderConfig, FusionConfig


def _read_config(path: str) -> Dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def decoder_config_from_hf(path: str, **overrides) -> DecoderConfig:
    """Build a DecoderConfig from a local HF Qwen3-family directory."""
    c = _read_config(path)
    arch = (c.get("architectures") or [""])[0]
    if "Qwen3" not in arch and c.get("model_type", "") not in ("qwen3", "qwen3_moe"):
        raise ValueError(f"{path}: expected a Qwen3-family checkpoint, got "
                         f"architectures={c.get('architectures')}")
    kw = dict(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        num_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        head_dim=c.get("head_dim", c["hidden_size"] // c["num_attention_heads"]),
        rope_theta=float(c.get("rope_theta", 1_000_000.0)),
        rms_norm_eps=float(c.get("rms_norm_eps", 1e-6)),
        tie_word_embeddings=bool(c.get("tie_word_embeddings", True)),
        max_position_embeddings=c.get("max_position_embeddings", 40960),
    )
    if c.get("num_experts"):                         # Qwen3-MoE (e.g. 30B-A3B)
        if c.get("mlp_only_layers") or c.get("decoder_sparse_step", 1) != 1:
            raise ValueError(f"{path}: mixed dense/sparse Qwen3-MoE layouts "
                             "(mlp_only_layers/decoder_sparse_step) are not "
                             "supported — all layers must be sparse")
        kw.update(num_experts=c["num_experts"],
                  num_experts_per_tok=c.get("num_experts_per_tok", 8),
                  moe_intermediate_size=c["moe_intermediate_size"],
                  norm_topk_prob=bool(c.get("norm_topk_prob", True)))
    kw.update(overrides)
    return DecoderConfig(**kw)


def encoder_config_from_hf(path: str, use_swiglu: Optional[bool] = None,
                           **overrides) -> EncoderConfig:
    """Build an EncoderConfig from a local HF ESM/NT-v2 directory.

    `use_swiglu` is normally inferred from the imported weights (NT-v2's
    fused gated MLP vs plain ESM gelu); pass it explicitly when building the
    config before importing."""
    c = _read_config(path)
    pe = c.get("position_embedding_type", "absolute")
    if pe != "rotary":
        raise ValueError(f"{path}: only rotary ESM encoders are supported "
                         f"(NT-v2 family); got position_embedding_type={pe!r}")
    kw = dict(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        rope_theta=10_000.0,
        norm_eps=float(c.get("layer_norm_eps", 1e-12)),
        use_swiglu=bool(use_swiglu) if use_swiglu is not None else True,
        attn_bias=True,
        # NT-v2 remote code: add_bias_fnn=False drops MLP biases
        mlp_bias=bool(c.get("add_bias_fnn", True)),
        token_dropout=bool(c.get("token_dropout", False)),
        mask_token_id=int(c.get("mask_token_id", 2)),
    )
    kw.update(overrides)
    return EncoderConfig(**kw)


def load_pretrained_decoder(path: str, **overrides) -> Tuple[DecoderConfig, Dict]:
    from bioreason_tpu.utils.hf_import import load_hf_state_dict, import_qwen3
    cfg = decoder_config_from_hf(path, **overrides)
    params = import_qwen3(load_hf_state_dict(path), cfg)
    return cfg, params


def load_pretrained_encoder(path: str, **overrides) -> Tuple[EncoderConfig, Dict]:
    from bioreason_tpu.utils.hf_import import load_hf_state_dict, import_esm
    params = import_esm(load_hf_state_dict(path))
    use_swiglu = "gate" in params["layers"]["mlp"]
    mlp_bias = "bias" in params["layers"]["mlp"]["up"]
    attn_bias = "bias" in params["layers"]["attn"]["q"]
    cfg = encoder_config_from_hf(path, use_swiglu=use_swiglu,
                                 **{"mlp_bias": mlp_bias, "attn_bias": attn_bias,
                                    **overrides})
    got_vocab = params["embed"]["embedding"].shape[0]
    if got_vocab != cfg.vocab_size:
        raise ValueError(f"{path}: config vocab_size {cfg.vocab_size} != "
                         f"embedding rows {got_vocab}")
    return cfg, params


def load_pretrained_evo2(path: str, embedding_tap_layer: int = -1,
                         **overrides):
    """Local Evo2/StripedHyena-2 checkpoint dir -> (HyenaConfig, params).

    Weights use vortex naming (utils/hf_import.import_evo2 derives per-layer
    operator flavors from the filter keys). An optional config.json supplies
    dims; otherwise they are inferred from the weight shapes. The reference
    loads this tower via `evo2.Evo2(dna_model_name)` (dna_llm.py:86-90) with
    the `--dna_embedding_layer blocks.N.mlp.l3` tap."""
    from bioreason_tpu.config import HyenaConfig
    from bioreason_tpu.utils.hf_import import load_hf_state_dict, import_evo2

    state = load_hf_state_dict(path)
    params, flavors = import_evo2(state)
    vocab, hidden = params["embed"]["embedding"].shape
    inner = params["blocks"][0]["mlp"]["gate"]["kernel"].shape[1]
    # head_dim 128 (Evo2's choice: 1920/128 = 15 heads) when it divides,
    # else a small-dim fallback; config.json num_attention_heads overrides
    head_dim = 128 if hidden % 128 == 0 else 8
    kw = dict(vocab_size=vocab, hidden_size=hidden, intermediate_size=inner,
              num_layers=len(flavors), layer_flavors=flavors,
              num_heads=hidden // head_dim,
              embedding_tap_layer=embedding_tap_layer)
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        if "num_attention_heads" in c:
            kw["num_heads"] = c["num_attention_heads"]
        if "rotary_emb_base" in c:
            kw["rope_theta"] = float(c["rotary_emb_base"])
    kw.update(overrides)
    return HyenaConfig(**kw), params


def load_dna_tokenizer(path: str):
    """NT-style k-mer tokenizer from the checkpoint's vocab.txt (exact id
    parity with the downloaded NT checkpoint); default layout if absent."""
    from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
    vocab_file = os.path.join(path, "vocab.txt")
    if os.path.exists(vocab_file):
        return KmerTokenizer.from_vocab_file(vocab_file)
    return KmerTokenizer()


def load_pretrained_fusion(
    llm_dir: str,
    dna_dir: Optional[str] = None,
    max_length_text: int = 512,
    max_length_dna: int = 2048,
    seed: int = 0,
    dtype: str = "bfloat16",
    evo2_dir: Optional[str] = None,
    dna_embedding_layer: int = -1,
) -> Tuple[FusionConfig, Dict, object, object]:
    """Assemble the full fusion model from local HF checkpoints.

    Returns (fusion_cfg, params, text_tokenizer, dna_tokenizer). The
    dna_projection is fresh-initialized (reference nn.Linear, dna_llm.py:97);
    everything else carries the pretrained weights. `dna_dir=None` gives an
    LLM-only model (no encoder params; DNA pasted as text); `evo2_dir`
    selects the Evo2 tower instead of NT (reference dna_is_evo2,
    dna_llm.py:86-90, char tokenizer + named-layer tap)."""
    from bioreason_tpu.data.text_tokenizer import load_hf_tokenizer

    tok = load_hf_tokenizer(llm_dir)
    dec_cfg, dec_params = load_pretrained_decoder(llm_dir, dtype=dtype)
    for name, tid in [("<|dna_start|>", tok.dna_start_id),
                      ("<|dna_pad|>", tok.dna_pad_id),
                      ("<|dna_end|>", tok.dna_end_id)]:
        if tid is None or tid < 0 or tid >= dec_cfg.vocab_size:
            raise ValueError(
                f"special token {name} id {tid} does not fit in the model "
                f"vocab ({dec_cfg.vocab_size}); the reference relies on the "
                f"Qwen3 embedding being padded past len(tokenizer) "
                f"(dna_llm.py:72-74 adds tokens without resizing)")

    hyena_cfg = None
    if evo2_dir is not None:
        from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
        hyena_cfg, enc_params = load_pretrained_evo2(
            evo2_dir, embedding_tap_layer=dna_embedding_layer, dtype=dtype)
        enc_cfg = EncoderConfig.tiny()       # unused placeholder
        dna_tok = CharDNATokenizer()
        dna_hidden = hyena_cfg.hidden_size
    elif dna_dir is None:
        enc_cfg = EncoderConfig.tiny()
        enc_params = None
        dna_tok = None
        dna_hidden = enc_cfg.hidden_size
    else:
        enc_cfg, enc_params = load_pretrained_encoder(dna_dir, dtype=dtype)
        dna_tok = load_dna_tokenizer(dna_dir)
        if dna_tok.vocab_size != enc_cfg.vocab_size:
            raise ValueError(f"DNA tokenizer vocab {dna_tok.vocab_size} != "
                             f"encoder vocab {enc_cfg.vocab_size}; supply the "
                             f"checkpoint's vocab.txt in {dna_dir}")
        dna_hidden = enc_cfg.hidden_size

    fusion_cfg = FusionConfig(
        decoder=dec_cfg, encoder=enc_cfg,
        encoder_kind="evo2" if evo2_dir is not None else "nt",
        hyena=hyena_cfg,
        dna_pad_token_id=tok.dna_pad_id,
        max_length_text=max_length_text, max_length_dna=max_length_dna)

    k_proj = jax.random.PRNGKey(seed)
    params: Dict = {
        "decoder": jax.tree.map(jnp.asarray, dec_params),
        "dna_projection": {
            "kernel": jax.random.normal(
                k_proj, (dna_hidden, dec_cfg.hidden_size), jnp.float32)
                * dna_hidden ** -0.5,
            "bias": jnp.zeros((dec_cfg.hidden_size,), jnp.float32),
        },
    }
    if enc_params is not None:
        params["encoder"] = jax.tree.map(jnp.asarray, enc_params)
    else:
        from bioreason_tpu.models.nt_encoder import init_encoder
        params["encoder"] = init_encoder(jax.random.fold_in(k_proj, 1), enc_cfg)
    return fusion_cfg, params, tok, dna_tok
