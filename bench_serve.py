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
    ap.add_argument("--requests", type=int, default=0,
                    help="0 = 3x capacity (keeps the pool saturated with a "
                         "real admission queue; fewer requests than capacity "
                         "measures a draining pool, not steady-state churn)")
    ap.add_argument("--window", type=int, default=16,
                    help="decode steps per host round trip (step_window)")
    ap.add_argument("--max_new", type=int, default=128)
    ap.add_argument("--max_len", type=int, default=256,
                    help="prompt-pool width (prompts here are 256 tokens)")
    ap.add_argument("--kv", default="bfloat16", choices=["bfloat16", "int8"],
                    help="pool KV storage; int8 halves pool HBM (the "
                         "memory lever that doubles capacity at fixed "
                         "max_len)")
    ap.add_argument("--fuse", action="store_true",
                    help="fused qkv/gateup projection kernels "
                         "(train/fuse.py): one wide dot per projection "
                         "group — the MXU small-N underfill fix")
    ap.add_argument("--w8a8", action="store_true",
                    help="int8 activations too (cfg.act_int8): every dense "
                         "runs on the int8 MXU (2x bf16 peak) — the vLLM "
                         "W8A8 serving scheme; cuts prefill compute time")
    ap.add_argument("--shared", type=int, default=1,
                    help="requests per unique prompt (>1 exercises the "
                         "same-batch prompt dedupe + prefix cache: GRPO-"
                         "style G-completion serving)")
    ap.add_argument("--probe", action="store_true",
                    help="print step_window host-phase timers (upload/"
                         "dispatch/toks_wait/replay) and mean occupancy")
    ap.add_argument("--no_pipeline", action="store_true",
                    help="use the serial admit/step_window loop instead of "
                         "run_pipelined (one window always in flight)")
    ap.add_argument("--tiers", default=None,
                    help="KV depth classes 'CAPxLEN,CAPxLEN' (serve.py "
                         "--tiers): per-class slot pools + length-routed "
                         "mixed-prompt churn. Reports total capacity and "
                         "pool HBM vs the single --capacity x --max_len "
                         "pool (VERDICT r4 #5: capacity >128 at fixed HBM)")
    args = ap.parse_args(argv)
    if not args.requests:
        args.requests = 3 * args.capacity
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
                                    remat=False, act_int8=args.w8a8),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False,
                                    act_int8=args.w8a8),
        dna_pad_token_id=151938,
    )
    if args.w8a8 and args.frozen != "int8":
        ap.error("--w8a8 requires --frozen int8 (act_int8 needs int8 kernels)")
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    if args.frozen == "int8":
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = quantize_frozen_int8(params, include_embed=True)
    if args.fuse:
        from bioreason_tpu.train.fuse import fuse_projections
        params = fuse_projections(params)

    npr = np.random.default_rng(0)
    prompts = {}

    def make_request(rid, max_new, p_text=P_TEXT):
        uid = (rid // args.shared, p_text)  # --shared N: N requests per prompt
        if uid not in prompts:
            ids = npr.integers(0, 150000, (1, p_text)).astype(np.int32)
            ids[0, 1:1 + L_DNA] = cfg.dna_pad_token_id
            dna = npr.integers(6, 4102, (1, L_DNA)).astype(np.int32)
            prompts[uid] = (ids, dna)
        ids, dna = prompts[uid]
        return Request(rid, ids, np.ones((1, p_text), np.int32),
                       dna, np.ones((1, L_DNA), np.int32),
                       max_new_tokens=max_new)

    # mixed completion lengths: the serving-realistic churn that static
    # batching can't fill (short requests free slots for the queue)
    lengths = [args.max_new, args.max_new // 2, args.max_new // 4]

    def kv_tok_bytes():
        d = cfg.decoder
        per = d.num_layers * d.num_kv_heads * d.head_dim * 2   # k+v
        return per * (1 if args.kv == "int8" else 2)

    if args.tiers:
        from bioreason_tpu.serve import _parse_tiers
        tiers = _parse_tiers(args.tiers)
        cbs = [ContinuousBatcher(
                   params, cfg, eos_token_id=-1, capacity=cap,
                   max_len=mlen, max_new=args.max_new, prompt_bucket=128,
                   kv_int8=(args.kv == "int8"),
                   sampling=SamplingConfig(temperature=0.6, top_p=0.95, top_k=20))
               for cap, mlen in tiers]
        total_cap = sum(c for c, _ in tiers)
        pool_b = sum(c * (l + args.max_new) for c, l in tiers) * kv_tok_bytes()
        base_b = args.capacity * (args.max_len + args.max_new) * kv_tok_bytes()
        print(f"tiers {tiers}: capacity {total_cap} "
              f"(baseline {args.capacity}), pool HBM "
              f"{pool_b/2**30:.2f} GiB vs baseline {base_b/2**30:.2f} GiB",
              file=__import__('sys').stderr)
        # per-tier prompt widths: fill each class's pool proportionally
        p_widths = [max(128, (mlen // 128) * 128 - 128) for _, mlen in tiers]
        for cb, pw in zip(cbs, p_widths):
            cb.warmup([pw], dna_shapes=((1, L_DNA),), windows=(args.window,))

        def run_tiered():
            reqs = []
            i = 0
            for t, (cap, _) in enumerate(tiers):
                for _ in range(args.requests * cap // total_cap):
                    reqs.append((t, make_request(
                        i, lengths[i % len(lengths)], p_text=p_widths[t])))
                    i += 1
            pending = {t: [r for tt, r in reqs if tt == t]
                       for t in range(len(tiers))}
            done = []
            while any(pending.values()) or any(cb.active.any() for cb in cbs):
                for t, cb in enumerate(cbs):
                    done.extend(r for r in cb.admit_many(pending[t]) if r.done)
                    if cb.active.any():
                        done.extend(cb.step_window(args.window))
            return sum(len(r.tokens) for r in done)

        run_tiered()
        t0 = time.perf_counter()
        total = run_tiered() + run_tiered()
        dt = time.perf_counter() - t0
        tokens_per_sec = total / dt
        print(json.dumps({
            "metric": "serving_tokens_per_sec_per_chip_tiered",
            "value": round(tokens_per_sec, 1),
            "unit": "tokens/s",
            "capacity": total_cap,
            "pool_hbm_gib": round(pool_b / 2**30, 2),
            "vs_baseline": round(tokens_per_sec / 5000.0, 3),
        }))
        return

    cb = ContinuousBatcher(
        params, cfg, eos_token_id=-1, capacity=args.capacity,
        max_len=args.max_len, max_new=args.max_new, prompt_bucket=256,
        kv_int8=(args.kv == "int8"), prefix_cache=(args.shared > 1),
        sampling=SamplingConfig(temperature=0.6, top_p=0.95, top_k=20))
    # vLLM-style startup precompile: every admission batch bucket + the
    # decode window — otherwise a first-seen batch size compiles mid-traffic
    cb.warmup([P_TEXT], dna_shapes=((1, L_DNA),), windows=(args.window,))

    import sys
    phase = {"admit": 0.0, "decode": 0.0}

    def run():
        reqs = [make_request(i, lengths[i % len(lengths)])
                for i in range(args.requests)]
        if not args.no_pipeline:
            done = cb.run_pipelined(reqs, window=args.window)
            return sum(len(r.tokens) for r in done)
        pending, done = list(reqs), []
        while pending or cb.active.any():
            t = time.perf_counter()
            done.extend(r for r in cb.admit_many(pending) if r.done)
            # no forced sync here: admission work is dispatched async and its
            # host wait (first-token transfer) is the natural phase boundary;
            # a block_until_ready would serialize admit against decode
            phase["admit"] += time.perf_counter() - t
            t = time.perf_counter()
            done.extend(cb.step_window(args.window))
            phase["decode"] += time.perf_counter() - t
        return sum(len(r.tokens) for r in done)

    run()                                    # residual warm (first-token path)
    phase["admit"] = phase["decode"] = 0.0
    if args.probe:
        cb.timers = {}
    t0 = time.perf_counter()
    total = run() + run()
    dt = time.perf_counter() - t0
    print(f"phase split: admit {phase['admit']:.2f}s "
          f"decode {phase['decode']:.2f}s of {dt:.2f}s", file=sys.stderr)
    if args.probe:
        tm = cb.timers
        nw = max(tm.get("windows", 0), 1)
        print("window probe: "
              + " ".join(f"{k}={tm[k]:.2f}s" for k in
                         ("upload", "admit", "dispatch", "toks_wait",
                          "replay", "pack")
                         if k in tm)
              + f" windows={tm.get('windows', 0)}"
              f" mean_occupancy={tm.get('rows', 0) / (nw * args.capacity):.2f}",
              file=sys.stderr)

    tokens_per_sec = total / dt
    print(json.dumps({
        "metric": "serving_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
