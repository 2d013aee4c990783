"""Full GRPO step throughput: rollout + rewards + ref logps + update.

End-to-end trainer-step timing at flagship shape (NT-500M-class encoder +
Qwen3-0.6B-class decoder, 4 prompts x G=4, 256-token prompts, 64-token
completions, beta=0.04 so ref logps run every step). Prints one JSON line:
completions processed per second per chip (a completion = one scored+trained
rollout sample).
"""

import json
import time


def main(argv=None):
    import argparse
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--rollout_int8", action="store_true",
                    help="quantize rollout weights + KV cache to int8")
    ap.add_argument("--decoder", default="qwen3-0.6b",
                    choices=["qwen3-0.6b", "qwen3-1.7b", "qwen3-4b"],
                    help="qwen3-4b = the config the reference RL-tunes on "
                         "4xA100 (sh_reason.sh:38-54); pair with "
                         "--rollout_int8 to fit one v5e chip")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps per optimizer "
                         "update (GRPOConfig.grad_accum_steps)")
    ap.add_argument("--frozen", default="bfloat16",
                    choices=["bfloat16", "int8"],
                    help="frozen-tower storage in the TRAINING tree "
                         "(GRPOConfig.frozen_dtype); int8 + --rollout_int8 "
                         "shares one quantized tower between training and "
                         "rollouts — required to fit qwen3-4b on one v5e")
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--G", type=int, default=4)
    ap.add_argument("--remat", default="full", choices=["off", "full", "dots"],
                    help="decoder remat for the update pass (GRPO batches "
                         "are small — B*T ~ 5k tokens — so remat-off often "
                         "fits and skips the recompute)")
    ap.add_argument("--probe", action="store_true",
                    help="print per-phase timers (prep/rollout/logps_dispatch"
                         "/rewards/update) for step-time attribution")
    args = ap.parse_args(argv)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                      GRPOConfig, LoRAConfig, OptimConfig,
                                      SamplingConfig)
    from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
    from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_prompt_only
    from bioreason_tpu.train.grpo import GRPOTrainer
    from bioreason_tpu.train.rewards import get_reward_funcs

    G, PROMPTS, NEW = args.G, args.prompts, 64
    DEC = {"qwen3-0.6b": DecoderConfig.qwen3_0_6b,
           "qwen3-1.7b": DecoderConfig.qwen3_1_7b,
           "qwen3-4b": DecoderConfig.qwen3_4b}[args.decoder]
    tok = ByteTextTokenizer()
    proc = BioProcessor(tok, KmerTokenizer())
    fusion = FusionConfig(
        decoder=dataclasses.replace(
            DEC(vocab_size=tok.vocab_size),
            remat=args.remat != "off",
            remat_policy="dots" if args.remat == "dots" else "full"),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False),
        dna_pad_token_id=tok.dna_pad_id,
        max_length_text=512, max_length_dna=128)
    cfg = GRPOConfig(
        num_generations=G, batch_size=PROMPTS * G, beta=0.04,
        rollout_int8=args.rollout_int8, grad_accum_steps=args.accum,
        frozen_dtype=args.frozen,
        max_completion_length=NEW,
        sampling=SamplingConfig(max_new_tokens=NEW),
        optim=OptimConfig(learning_rate=5e-6, total_steps=100),
        lora=LoRAConfig(r=32, alpha=64))
    trainer = GRPOTrainer(fusion, cfg, proc,
                          get_reward_funcs(["xmlcount", "correctness"]))
    items = [format_kegg_prompt_only(it)
             for it in synthetic_kegg_items(PROMPTS, seq_len=600, seed=0)]
    items = [p for p in items for _ in range(G)]

    trainer.step(items)     # compile everything
    n = 5
    if args.probe:
        trainer.timers = {}
    t0 = time.perf_counter()
    for _ in range(n):
        trainer.step(items)
    dt = time.perf_counter() - t0
    completions_per_sec = PROMPTS * G * n / dt
    if args.probe:
        import sys
        tm = trainer.timers
        print("phase probe: "
              + " ".join(f"{k}={tm[k]:.2f}s" for k in
                         ("prep", "rollout", "logps_dispatch", "rewards",
                          "update") if k in tm)
              + f" steps={tm.get('steps', 0)} total={dt:.2f}s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "grpo_full_step_completions_per_sec_per_chip",
        "value": round(completions_per_sec, 2),
        "unit": "completions/s",
        "vs_baseline": round(dt / n, 2),   # seconds per optimizer step (info)
    }))


if __name__ == "__main__":
    main()
