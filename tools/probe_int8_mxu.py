"""Microbench: is the int8 MXU path actually faster than bf16 on this chip?

The W8A8 serving mode (layers._w8a8_dot) assumes v5e's 394 int8 TOPS vs
197 bf16 TFLOP/s pays on prefill-sized dots. bench_serve measured only
+1-2% — this probe times the raw dot variants at the serving prefill shape
to attribute: (a) bf16 dequant-dot (the weight-only-int8 baseline),
(b) s8xs8 dot with pre-quantized activations (pure MXU question),
(c) the full _w8a8_dot incl. dynamic per-token quantization.

Timing via float() host transfer (block_until_ready unreliable through the
axon tunnel, CLAUDE.md).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.models import layers as L
from bioreason_tpu.train.quant import quantize_kernel_int8


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))        # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    # serving prefill shape class: admission runs K>=64 rows x P=256 tokens
    # through 1024-wide denses (0.6B) — N tokens x [H, H'] kernels
    rng = np.random.default_rng(0)
    for (n, h, h2) in [(16384, 1024, 1024), (16384, 1024, 3072),
                       (4096, 1024, 1024), (3072, 1024, 151936)]:
        x = jnp.asarray(rng.standard_normal((n, h)), jnp.bfloat16)
        w = rng.standard_normal((h, h2)).astype(np.float32) * 0.02
        kern = quantize_kernel_int8(w)
        kern = jax.tree.map(jnp.asarray, kern)
        xq = jnp.asarray(rng.integers(-127, 127, (n, h)), jnp.int8)
        wq = kern["q"]

        bf16 = jax.jit(lambda x, k: L.dense({"kernel": k}, x, jnp.bfloat16))
        w8a8 = jax.jit(lambda x, k: L.dense({"kernel": k}, x, jnp.bfloat16,
                                            act8=True))

        def s8s8(xq, wq):
            return jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        s8 = jax.jit(s8s8)
        tf = 2 * n * h * h2 / 1e12
        t_bf = timeit(bf16, x, kern)
        t_s8 = timeit(s8, xq, wq)
        t_w8 = timeit(w8a8, x, kern)
        print(f"[{n}x{h}x{h2}] {tf:.3f} TF  "
              f"bf16(dequant) {t_bf*1e3:7.3f} ms {tf/t_bf:6.1f} TF/s | "
              f"s8xs8 {t_s8*1e3:7.3f} ms {tf/t_s8:6.1f} TOP/s | "
              f"w8a8(full) {t_w8*1e3:7.3f} ms {tf/t_w8:6.1f} TF/s")


if __name__ == "__main__":
    main()
