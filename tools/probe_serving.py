"""Serving-phase microprobe: where does admission/decode time actually go.

Times the ContinuousBatcher's individual jitted pieces on the real chip —
prefill at each admission batch bucket, the KV pool write, the first-token
sample, and decode windows at each history-width bucket. Timing is by
host transfer of a scalar (float(x)) because block_until_ready does not
reliably sync through the axon tunnel (see CLAUDE.md).

Usage: python tools/probe_serving.py [--capacity 128] [--window 32]
"""

import argparse
import os
import time


def sync(x):
    """Force completion: host-transfer one element."""
    import jax.numpy as jnp
    leaf = None

    def pick(v):
        nonlocal leaf
        if leaf is None and hasattr(v, "ravel"):
            leaf = v
    import jax
    jax.tree.map(pick, x)
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=128)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--max_new", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--w8a8", action="store_true",
                    help="act_int8 serving mode (bench_serve --w8a8)")
    ap.add_argument("--fuse", action="store_true",
                    help="fused qkv/gateup kernels (bench_serve --fuse)")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig,
                                      FusionConfig, SamplingConfig)
    from bioreason_tpu.generate.continuous import ContinuousBatcher
    from bioreason_tpu.models import init_fusion
    from bioreason_tpu.train.quant import quantize_frozen_int8

    P, L_DNA = 256, 128
    cfg = FusionConfig(
        decoder=dataclasses.replace(DecoderConfig.qwen3_0_6b(vocab_size=151936),
                                    remat=False, act_int8=args.w8a8),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False,
                                    act_int8=args.w8a8),
        dna_pad_token_id=151938)
    params = quantize_frozen_int8(init_fusion(jax.random.PRNGKey(0), cfg),
                                  include_embed=True)
    if args.fuse:
        from bioreason_tpu.train.fuse import fuse_projections
        params = fuse_projections(params)
    cb = ContinuousBatcher(params, cfg, eos_token_id=-1,
                           capacity=args.capacity, max_len=P,
                           max_new=args.max_new, prompt_bucket=P,
                           kv_int8=True,
                           sampling=SamplingConfig(temperature=0.6,
                                                   top_p=0.95, top_k=20))
    t0 = time.perf_counter()
    cb.warmup([P], dna_shapes=((1, L_DNA),), windows=(args.window,))
    print(f"warmup: {time.perf_counter() - t0:.1f}s")

    def timeit(label, fn, reps=args.reps):
        fn()                                     # warm dispatch path
        t = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t) / reps
        print(f"{label:42s} {dt * 1e3:9.2f} ms")
        return dt

    npr = np.random.default_rng(0)

    def inputs(k):
        ids = npr.integers(0, 150000, (k, P)).astype(np.int32)
        ids[:, 1:1 + L_DNA] = cfg.dna_pad_token_id
        mask = np.ones((k, P), np.int32)
        dna = npr.integers(6, 4102, (k, L_DNA)).astype(np.int32)
        dmask = np.ones((k, L_DNA), np.int32)
        return jax.device_put((ids, mask, dna, dmask))

    drop = jnp.full((1,), args.capacity, jnp.int32)
    for k in (1, 4, 16, 64, 128):
        if k > cb._pow2_bucket(args.capacity):
            break
        ids, mask, dna, dmask = inputs(k)
        gather = jnp.arange(k, dtype=jnp.int32)
        slots = jnp.broadcast_to(drop, (k,))

        def prefill():
            kv, lg, lh = cb._jit_prefill(cb.params, ids, mask, dna, dmask)
            sync(lg)
            return kv, lg

        dt_p = timeit(f"prefill K={k} (P={P} + {L_DNA} dna)", prefill)
        tok_s = k * P / dt_p
        flops = 2 * 0.44e9 * k * P + 2 * 0.48e9 * k * L_DNA
        print(f"{'':42s} -> {tok_s:,.0f} prompt tok/s, "
              f"{flops / dt_p / 1e12:.1f} TF/s")

        kv, lg, _ = cb._jit_prefill(cb.params, ids, mask, dna, dmask)

        def write():
            cb.prompt_pool = cb._jit_write(cb.prompt_pool, kv, slots, gather)
            sync(cb.prompt_pool[0]["k"])
        timeit(f"pool write K={k}", write)

        def first():
            g, s = cb._jit_first(jax.random.PRNGKey(0), lg, None, gather)
            sync(s)
        timeit(f"first-token K={k}", first)

    # decode windows at each history bucket, all rows active
    cb.active[:] = True
    cb.prompt_mask[:] = 1
    cb.positions[:] = P
    cb.greedy_row[:] = False
    hist = sorted({0, 32, args.max_new // 2, args.max_new})
    for w in hist:
        cb.dec_len[:] = w
        cb._dev_dirty = True
        cb._upload_state()
        pm, last, pos, dl, act, gst = cb._dev_state

        def win(w=w):
            # donated args must be threaded through (fresh buffers per call)
            nonlocal last, pos, dl, act, gst
            c, toks = cb._get_multi(args.window, w)(
                cb.params, cb.prompt_pool, cb.dec_pool, pm, last, pos, dl,
                act, cb._dev_greedy, cb._rng, gst)
            cb.dec_pool, last, pos, dl, act, cb._rng, gst = c
            sync(toks)
            return toks
        dt = timeit(f"window k={args.window} hist w={w}", win)
        print(f"{'':42s} -> {dt / args.window * 1e3:.2f} ms/step, "
              f"{args.capacity * args.window / dt:,.0f} tok/s all-active")


if __name__ == "__main__":
    main()
