"""GRPO learning-signal validation (slow; enable with BIOREASON_SLOW=1).

A rigged reward (count of the letter 'a' in the completion) must increase
under GRPO — direction check on the clipped-surrogate loss end-to-end
through rollout -> reward -> group-normalized advantage -> update.

Verified result (2026-08-16, CPU mesh 4x2, 30 steps): mean reward
0.112 (first 5 steps) -> 0.288 (last 5 steps).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("BIOREASON_SLOW"),
                                reason="slow: set BIOREASON_SLOW=1")


def test_rigged_reward_increases():
    from bioreason_tpu.config import (FusionConfig, GRPOConfig, MeshConfig,
                                      OptimConfig, SamplingConfig)
    from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
    from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_prompt_only
    from bioreason_tpu.parallel import make_mesh
    from bioreason_tpu.train.grpo import GRPOTrainer

    tok = ByteTextTokenizer()
    proc = BioProcessor(tok, KmerTokenizer())

    def letter_reward(prompts, completions, answer=None, **kw):
        return [min(c.count("a"), 8) / 4.0 for c in completions]

    fusion = FusionConfig.tiny(text_vocab=tok.vocab_size,
                               dna_pad_token_id=tok.dna_pad_id)
    cfg = GRPOConfig(num_generations=4, batch_size=8, beta=0.0, num_iterations=1,
                     max_completion_length=16,
                     sampling=SamplingConfig(temperature=1.0, top_k=40, top_p=1.0,
                                             max_new_tokens=16),
                     optim=OptimConfig(learning_rate=3e-3, total_steps=40,
                                       warmup_ratio=0.0),
                     lora=None, seed=0)
    trainer = GRPOTrainer(fusion, cfg, proc, [letter_reward],
                          mesh=make_mesh(MeshConfig(data=4, fsdp=2)))
    prompts = [format_kegg_prompt_only(it)
               for it in synthetic_kegg_items(2, seq_len=24)]
    items = [p for p in prompts for _ in range(4)]
    rewards = [trainer.step(items)["reward"] for _ in range(30)]
    early, late = np.mean(rewards[:5]), np.mean(rewards[-5:])
    assert late > early * 1.5, f"reward did not improve: {early} -> {late}"
