"""PP embed-sharding A/B on the 8-device CPU mesh (BENCHMARKS.md PP section).

Usage: python tools/probe_pp.py old|new  (old = r4 hidden-sharded embed,
new = current replicated-embed rules; stderr carries any SPMD
involuntary-remat warnings).
"""
import sys, time
import numpy as np
from bioreason_tpu.utils import force_cpu_devices
force_cpu_devices(8)
import jax
from bioreason_tpu.config import (FusionConfig, LoRAConfig, MeshConfig,
                                  OptimConfig, SFTConfig)
from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
from bioreason_tpu.data.collate import sft_collate
from bioreason_tpu.data.kegg import format_kegg_for_dna_llm, synthetic_kegg_items
from bioreason_tpu.parallel import make_mesh
import bioreason_tpu.train.sft as sft_mod

mode = sys.argv[1]          # 'old' | 'new'
if mode == "old":
    import re
    from jax.sharding import PartitionSpec as P
    orig = sft_mod.partition_rules_fusion
    def patched(pp=False):
        rules = orig(pp)
        if pp:
            rules = [(pat, P(None, "fsdp") if "embed/embedding" in pat and
                      pat.startswith(re.escape("decoder/")) else spec)
                     for pat, spec in rules]
        return rules
    sft_mod.partition_rules_fusion = patched

mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
tok = ByteTextTokenizer()
proc = BioProcessor(tok, KmerTokenizer())
fusion_cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                               dna_pad_token_id=tok.dna_pad_id)
sft_cfg = SFTConfig(batch_size=8, max_length_dna=64,
                    optim=OptimConfig(total_steps=100),
                    lora=LoRAConfig(r=4, alpha=8), pp_micro=2)
trainer = sft_mod.SFTTrainer(fusion_cfg, sft_cfg, mesh=mesh)
items = [format_kegg_for_dna_llm(it)
         for it in synthetic_kegg_items(8, seq_len=48, seed=0)]
batch = sft_collate(items, proc, max_length_text=512, max_length_dna=64)
for _ in range(2):
    m = trainer.train_step(batch)
t0 = time.perf_counter()
for _ in range(8):
    m = trainer.train_step(batch)
dt = (time.perf_counter() - t0) / 8
print(f"RESULT mode={mode} step_ms={dt*1000:.1f} loss={m['loss']:.4f}")
