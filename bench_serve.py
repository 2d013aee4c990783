"""Serving throughput benchmark: continuous batching under request churn.

Drives generate/continuous.py (the vLLM-role slot scheduler,
grpo_config.py:230-281 / demo_grpo.py:366-425 in the reference) at the
serving shape: NT-500M-class encoder + Qwen3-0.6B-class decoder, int8
serving weights, a queue of DNA-spliced requests with mixed completion
lengths admitted as slots free up, decode windows amortizing the host
scheduling round trip. Prints one JSON line: decoded tokens/s/chip.

Unlike bench_rollout.py (one static batch of grouped rollouts), this
measures the serving property: sustained throughput while requests enter
and leave mid-flight.
"""

import json
import time


def main(argv=None):
    import argparse
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--frozen", default="int8", choices=["bfloat16", "int8"])
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--window", type=int, default=16,
                    help="decode steps per host round trip (step_window)")
    ap.add_argument("--max_new", type=int, default=128)
    ap.add_argument("--max_len", type=int, default=640)
    ap.add_argument("--kv", default="bfloat16", choices=["bfloat16", "int8"],
                    help="slot-pool KV storage; int8 halves pool HBM (the "
                         "memory lever that doubles capacity at fixed "
                         "max_len)")
    args = ap.parse_args(argv)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig,
                                      FusionConfig, SamplingConfig)
    from bioreason_tpu.generate.continuous import ContinuousBatcher, Request
    from bioreason_tpu.models import init_fusion

    P_TEXT, L_DNA = 256, 128
    cfg = FusionConfig(
        decoder=dataclasses.replace(DecoderConfig.qwen3_0_6b(vocab_size=151936),
                                    remat=False),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False),
        dna_pad_token_id=151938,
    )
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    if args.frozen == "int8":
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = quantize_frozen_int8(params, include_embed=True)

    npr = np.random.default_rng(0)

    def make_request(rid, max_new):
        ids = npr.integers(0, 150000, (1, P_TEXT)).astype(np.int32)
        ids[0, 1:1 + L_DNA] = cfg.dna_pad_token_id
        dna = npr.integers(6, 4102, (1, L_DNA)).astype(np.int32)
        return Request(rid, ids, np.ones((1, P_TEXT), np.int32),
                       dna, np.ones((1, L_DNA), np.int32),
                       max_new_tokens=max_new)

    # mixed completion lengths: the serving-realistic churn that static
    # batching can't fill (short requests free slots for the queue)
    lengths = [args.max_new, args.max_new // 2, args.max_new // 4]

    cb = ContinuousBatcher(
        params, cfg, eos_token_id=-1, capacity=args.capacity,
        max_len=args.max_len, prompt_bucket=256, kv_int8=(args.kv == "int8"),
        sampling=SamplingConfig(temperature=0.6, top_p=0.95, top_k=20))
    # vLLM-style startup precompile: every admission batch bucket + the
    # decode window — otherwise a first-seen batch size compiles mid-traffic
    cb.warmup([P_TEXT], dna_shapes=((1, L_DNA),), windows=(args.window,))

    def run():
        reqs = [make_request(i, lengths[i % len(lengths)])
                for i in range(args.requests)]
        done = cb.run(reqs, window=args.window)
        return sum(len(r.tokens) for r in done)

    run()                                    # residual warm (first-token path)
    t0 = time.perf_counter()
    total = run() + run()
    dt = time.perf_counter() - t0

    tokens_per_sec = total / dt
    print(json.dumps({
        "metric": "serving_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
