"""Sweep flash-attention block sizes on the real chip (perf tuning tool)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import bioreason_tpu.ops.flash_attention as fa
from bioreason_tpu.ops.flash_attention import flash_attention


def main():
    B, T, H, HKV, D = 4, 768, 16, 8, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, HKV, D), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default=None,
                    help="comma list of bqxbk pairs, e.g. 256x384,384x384 "
                         "(default: full ladder)")
    ap.add_argument("--bwd", action="store_true",
                    help="time fwd+bwd (the training-step mix) instead of fwd")
    ap.add_argument("--loop", type=int, default=0,
                    help="N>0: chain N attention calls inside ONE jit "
                         "(output feeds the next call's q) and report "
                         "ms/call — removes the per-dispatch tunnel floor "
                         "that a 30-call host loop carries")
    args = ap.parse_args()

    shapes = [(128, 128), (128, 256), (256, 128), (256, 256), (128, 384),
              (384, 128), (256, 384), (384, 256), (384, 384), (256, 768),
              (384, 768), (768, 256), (768, 384), (768, 768)]
    if args.blocks:
        shapes = [tuple(int(x) for x in p.split("x"))
                  for p in args.blocks.split(",")]
    for bq, bk in shapes:
      if T % bq or T % bk:
            continue
      # single-block shapes have two bwd schemes: fused one-pass vs tiled
      variants = ([("fused", True), ("tiled", False)]
                  if args.bwd and bq >= T and bk >= T else [("", None)])
      for tag, fused in variants:
        if fused is not None:
            fa._FUSED_SINGLE_BWD = fused

        def fwd_only(q, k, v, bq=bq, bk=bk):
            return flash_attention(q, k, v, kv_mask=mask, causal=True,
                                   block_q=bq, block_k=bk)

        def fwd_bwd(q, k, v, bq=bq, bk=bk):
            # grad over ALL operands: grad wrt q alone lets XLA drop the
            # dk/dv kernel entirely and the sweep mis-ranks block shapes
            def loss(q, k, v):
                o = flash_attention(q, k, v, kv_mask=mask, causal=True,
                                    block_q=bq, block_k=bk)
                return jnp.sum(o.astype(jnp.float32))
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            # consume dk/dv with a real data dependence: returning dq alone
            # lets XLA drop the dk/dv kernel entirely (in --loop mode the
            # scan carry is the only live value)
            return dq + (jnp.sum(dk) + jnp.sum(dv)).astype(dq.dtype) * 1e-20

        one = fwd_bwd if args.bwd else fwd_only

        if args.loop:
            def chained(q, k, v, n=args.loop):
                def body(carry, _):
                    qc = carry
                    out = one(qc, k, v)
                    # feed the output back as q: data dependence stops XLA
                    # from collapsing the N iterations
                    return out.astype(qc.dtype), ()
                final, _ = jax.lax.scan(body, q, None, length=n)
                return final
            f = jax.jit(chained)
            calls = args.loop
            reps = 3
        else:
            f = jax.jit(one)
            calls = 1
            reps = 30
        try:
            o = f(q, k, v)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(reps):
                o = f(q, k, v)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / (reps * calls) * 1000
            print(f"bq={bq} bk={bk} {tag}: {ms:.3f} ms", flush=True)
        except Exception as e:
            print(f"bq={bq} bk={bk} {tag}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
