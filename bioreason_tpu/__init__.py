"""bioreason_tpu: a TPU-native DNA-encoder + LLM reasoning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of bowang-lab/BioReason:
a DNA foundation-model encoder whose per-nucleotide embeddings are projected
into the token stream of a causal LLM, trained with SFT (LoRA) and GRPO RL,
and evaluated on KEGG / ClinVar variant-effect reasoning tasks.

Layering (bottom-up):
  data/      tokenizers, chat template, bi-modal processor, collators, datasets
  ops/       Pallas TPU kernels (flash attention, sampling)
  models/    Qwen3-style decoder, NT-v2-style encoder, fusion model, classifier
  parallel/  mesh + partition-spec rules (DP/FSDP/TP via GSPMD)
  train/     LoRA, optimizers, SFT loop, GRPO trainer, checkpointing, metrics
  generate/  jitted KV-cached prefill+decode engine (rollouts + eval)
"""

__version__ = "0.1.0"

_LAZY = {
    "DnaLLM": "bioreason_tpu.models.api",
    "DNAClassifier": "bioreason_tpu.models.api",
    "BioProcessor": "bioreason_tpu.data.processor",
    "FusionConfig": "bioreason_tpu.config",
    "GenerationEngine": "bioreason_tpu.generate.engine",
}


def __getattr__(name):
    """Lazy top-level exports (importing bioreason_tpu stays jax-free)."""
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'bioreason_tpu' has no attribute {name!r}")
