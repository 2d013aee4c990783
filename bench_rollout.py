"""GRPO rollout throughput benchmark (BASELINE target: >=5k tokens/s/chip).

Measures the jitted prefill+decode engine on the flagship shape: NT-500M-class
encoder + Qwen3-0.6B-class decoder, 16 unique prompts x G=8 grouped completions
(128 concurrent rows) with prefix-shared prefill, temperature/top-p/top-k sampling at the reference
values. Prints one JSON line: decoded tokens per second per chip.
"""

import json
import time


def main(argv=None):
    import argparse
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--frozen", default="bfloat16", choices=["bfloat16", "int8"],
                    help="int8: serve quantized base weights (QLoRA-style "
                         "storage; decode is weights-bandwidth-bound, so "
                         "halving resident bytes speeds the token loop)")
    ap.add_argument("--prompts", type=int, default=16)
    ap.add_argument("--g", type=int, default=8, help="completions per prompt")
    ap.add_argument("--kv", default="bfloat16", choices=["bfloat16", "int8"],
                    help="KV-cache storage (int8: memory lever — 2x slots; "
                         "~5% slower at weights-dominated shapes)")
    ap.add_argument("--fuse", action="store_true",
                    help="fused qkv/gateup projection kernels (train/fuse.py)")
    args = ap.parse_args(argv)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                      SamplingConfig)
    from bioreason_tpu.generate.engine import GenerationEngine
    from bioreason_tpu.models import init_fusion

    N_PROMPTS, G, P_TEXT, S_DNA, L_DNA, NEW = args.prompts, args.g, 256, 2 * args.prompts, 128, 128

    cfg = FusionConfig(
        decoder=dataclasses.replace(DecoderConfig.qwen3_0_6b(vocab_size=151936),
                                    remat=False),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False),
        dna_pad_token_id=151938,
    )
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    if args.frozen == "int8":
        # serving configuration: kernels AND embedding/logits head int8 —
        # every weight byte the decode loop streams is int8
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = quantize_frozen_int8(params, include_embed=True)
    if args.fuse:
        from bioreason_tpu.train.fuse import fuse_projections
        params = fuse_projections(params)
    engine = GenerationEngine(cfg, eos_token_id=-1,    # no eos: decode all NEW
                              kv_int8=(args.kv == "int8"))

    npr = np.random.default_rng(0)
    input_ids = npr.integers(0, 150000, (N_PROMPTS, P_TEXT)).astype(np.int32)
    per_item = (S_DNA // N_PROMPTS) * L_DNA
    for b in range(N_PROMPTS):
        input_ids[b, 1:1 + per_item] = cfg.dna_pad_token_id
    dna_ids = npr.integers(6, 4102, (S_DNA, L_DNA)).astype(np.int32)
    dna_mask = np.ones((S_DNA, L_DNA), np.int32)
    attention_mask = np.ones((N_PROMPTS, P_TEXT), np.int32)
    sampling = SamplingConfig(temperature=0.6, top_p=0.95, top_k=20)

    def run(rng):
        toks, mask = engine.generate(
            params, input_ids, attention_mask, dna_ids, dna_mask,
            sampling=sampling, max_new_tokens=NEW,
            rng=jax.random.PRNGKey(rng), group_size=G)
        return int(np.asarray(mask).sum())

    run(0)  # compile
    t0 = time.perf_counter()
    total = sum(run(i + 1) for i in range(3))
    dt = time.perf_counter() - t0

    tokens_per_sec = total / dt
    print(json.dumps({
        "metric": "grpo_rollout_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
