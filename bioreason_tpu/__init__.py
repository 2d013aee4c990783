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
