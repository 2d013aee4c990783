"""Shared CLI plumbing: dataset loading + model-size presets.

Replaces the reference's three config styles (argparse / TRL dataclasses /
DeepSpeed JSON — SURVEY §5) with argparse over the dataclass config tree.
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

from bioreason_tpu.config import DecoderConfig, EncoderConfig, FusionConfig, HyenaConfig
from bioreason_tpu.data.kegg import (KEGGDataset, synthetic_kegg_items,
                                     format_kegg_for_dna_llm, format_kegg_for_llm)
from bioreason_tpu.data.variant_effect import (
    clean_variant_effect_example, clean_variant_effect_non_snv_example,
    format_variant_effect_for_dna_llm, format_variant_effect_for_llm)
from bioreason_tpu.data.utils import split_dataset, truncate_dna

DECODER_PRESETS = {
    "tiny": DecoderConfig.tiny,
    "qwen3-0.6b": DecoderConfig.qwen3_0_6b,
    "qwen3-1.7b": DecoderConfig.qwen3_1_7b,
    "qwen3-4b": DecoderConfig.qwen3_4b,
}
ENCODER_PRESETS = {
    "tiny": EncoderConfig.tiny,
    "nt-50m": EncoderConfig.nt_v2_50m,
    "nt-250m": EncoderConfig.nt_v2_250m,
    "nt-500m": EncoderConfig.nt_v2_500m,
}
HYENA_PRESETS = {
    "evo2-tiny": HyenaConfig.tiny,
    "evo2-1b": HyenaConfig.evo2_1b,
}


def build_encoder_config(name: str, dna_embedding_layer: int = -1):
    """Returns (encoder_kind, EncoderConfig or None, HyenaConfig or None,
    dna_tokenizer). Evo2 presets use the char tokenizer + optional named-layer
    embedding tap (reference --dna_embedding_layer, dna_llm.py:127-146)."""
    import dataclasses
    from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
    from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
    if name in HYENA_PRESETS:
        hy = HYENA_PRESETS[name]()
        if dna_embedding_layer >= 0:
            hy = dataclasses.replace(hy, embedding_tap_layer=dna_embedding_layer)
        return "evo2", EncoderConfig.tiny(), hy, CharDNATokenizer()
    return "nt", ENCODER_PRESETS[name](), None, KmerTokenizer()


def load_items(dataset_type: str, data_dir: str | None, n_synthetic: int,
               truncate_per_side: int, seed: int = 42,
               llm_only: bool = False) -> Tuple[List[Dict], List[Dict], List[Dict]]:
    """Load + normalize + truncate + split + chat-format the dataset.

    Mirrors the reference dataloader builders (train_dna_qwen.py:413-642):
    kegg from a JSON dir (or the synthetic corpus when no dir is given),
    variant_effect_* expect JSONL/JSON dirs with question/answer/sequences.
    """
    if data_dir:
        from bioreason_tpu.data.loaders import load_local_dataset
        raw = load_local_dataset(data_dir)
    else:
        raw = synthetic_kegg_items(n_synthetic, seq_len=512, seed=seed)

    if dataset_type == "variant_effect_coding":
        raw = [clean_variant_effect_example(dict(x)) for x in raw]
        fmt = format_variant_effect_for_llm if llm_only else format_variant_effect_for_dna_llm
    elif dataset_type == "variant_effect_non_snv":
        raw = [clean_variant_effect_non_snv_example(dict(x)) for x in raw]
        fmt = format_variant_effect_for_llm if llm_only else format_variant_effect_for_dna_llm
    else:
        fmt = format_kegg_for_llm if llm_only else format_kegg_for_dna_llm

    raw = [truncate_dna(dict(x), truncate_per_side) for x in raw]
    train, val, test = split_dataset(raw, seed=seed)
    return [fmt(x) for x in train], [fmt(x) for x in val], [fmt(x) for x in test]


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset_type", default="kegg",
                   choices=["kegg", "variant_effect_coding", "variant_effect_non_snv"])
    p.add_argument("--data_dir", default=None, help="JSON dir; synthetic corpus if unset")
    p.add_argument("--n_synthetic", type=int, default=64)
    p.add_argument("--truncate_dna_per_side", type=int, default=1024)
    p.add_argument("--max_length_text", type=int, default=512)
    p.add_argument("--max_length_dna", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=0, help="0 = epoch-bounded")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="force N virtual CPU devices (testing)")
    p.add_argument("--mesh", default="auto",
                   help="'auto' or 'data,fsdp,model' e.g. '4,2,1'")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast at the op that "
                        "produced a NaN — the sanitizer story the reference "
                        "lacks, SURVEY §5)")
    return p


def apply_debug_flags(args):
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)


def build_mesh(spec: str):
    """'auto' | 'd,f,m' | 'multislice[:f,m]' (pod recipe: data over DCN,
    fsdp/model inside each slice's ICI — parallel/mesh.py)."""
    from bioreason_tpu.config import MeshConfig
    from bioreason_tpu.parallel import make_mesh, make_multislice_mesh
    if spec == "auto":
        return make_mesh(MeshConfig())
    if spec.startswith("multislice"):
        f, m = 1, 1
        if ":" in spec:
            f, m = (int(x) for x in spec.split(":", 1)[1].split(","))
        return make_multislice_mesh(MeshConfig(fsdp=f, model=m))
    d, f, m = (int(x) for x in spec.split(","))
    return make_mesh(MeshConfig(data=d, fsdp=f, model=m))
