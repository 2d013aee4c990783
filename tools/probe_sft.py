"""Bisection probe for the SFT train step on the real chip.

The profiler hangs through the axon tunnel (CLAUDE.md), so step-time
attribution is done by ablation: time the full bench.py step, then variants
with one component removed/substituted, and read the deltas. Each variant is
a separate jit; timings gate on a host scalar transfer.

Variants:
  full          bench.py step (fwd+bwd+optimizer), pallas attention
  fwd           loss forward only (no grad, no optimizer)
  xla_attn      full step with attention_impl='xla' in both towers
  no_encoder    full step with the DNA tower ablated (text-only embeds)
  dense_ce      full step with whole-row fused CE (labels=) instead of the
                gathered supervised-position head
"""

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp
import numpy as np
import optax

from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                  LoRAConfig, OptimConfig)
from bioreason_tpu.models import fusion_forward, init_fusion
from bioreason_tpu.ops.fused_ce import gather_label_positions
from bioreason_tpu.train import trainable as T
from bioreason_tpu.train.lora import attach_lora
from bioreason_tpu.train.optim import make_optimizer

B, T_TEXT, L_DNA = 4, 768, 128
S_DNA = 2 * B


def build(attention_impl="auto"):
    cfg = FusionConfig(
        decoder=dataclasses.replace(DecoderConfig.qwen3_0_6b(vocab_size=151936),
                                    remat=False, attention_impl=attention_impl),
        encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(),
                                    remat=False, attention_impl=attention_impl),
        dna_pad_token_id=151938,
    )
    rng = jax.random.PRNGKey(0)
    params = init_fusion(rng, cfg)
    params = attach_lora(jax.random.fold_in(rng, 1), params,
                         LoRAConfig(r=32, alpha=64))
    partition = T.make_partition(params, T.LORA_TRAINABLE)
    train_leaves, frozen_leaves = T.split(partition, params)
    frozen_leaves = [l.astype(jnp.bfloat16)
                     if l.dtype == jnp.float32 and l.ndim >= 2 else l
                     for l in frozen_leaves]
    return cfg, partition, train_leaves, frozen_leaves


def make_batch(cfg):
    npr = np.random.default_rng(0)
    input_ids = npr.integers(0, 150000, (B, T_TEXT)).astype(np.int32)
    per_item = S_DNA // B * L_DNA
    for b in range(B):
        input_ids[b, 1:1 + per_item] = cfg.dna_pad_token_id
    dna_ids = npr.integers(6, 4102, (S_DNA, L_DNA)).astype(np.int32)
    labels = np.where(np.arange(T_TEXT)[None] >= T_TEXT - 128, input_ids, -100)
    pos, tgt, val = gather_label_positions(labels)
    return {k: jnp.asarray(v) for k, v in dict(
        input_ids=input_ids,
        attention_mask=np.ones((B, T_TEXT), np.int32),
        dna_input_ids=dna_ids,
        dna_attention_mask=np.ones((S_DNA, L_DNA), np.int32),
        labels=labels,
        label_positions=pos, label_targets=tgt, label_valid=val).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="full,fwd,xla_attn,no_encoder,dense_ce")
    args = ap.parse_args()
    want = args.variants.split(",")

    results = {}
    for name in want:
        impl = "xla" if name == "xla_attn" else "auto"
        cfg, partition, train_leaves, frozen_leaves = build(impl)
        batch = make_batch(cfg)
        tx, _ = make_optimizer(OptimConfig(total_steps=100))
        opt_state = tx.init(train_leaves)

        def loss_fn(train, frozen, batch, mode=name):
            p = T.combine(partition, train, frozen)
            kw = dict(label_positions=batch["label_positions"],
                      label_targets=batch["label_targets"],
                      label_valid=batch["label_valid"])
            dna = (batch["dna_input_ids"], batch["dna_attention_mask"])
            if mode == "dense_ce":
                kw = dict(labels=batch["labels"])
            if mode == "no_encoder":
                dna = (None, None)
            _, loss = fusion_forward(p, cfg, batch["input_ids"],
                                     batch["attention_mask"], *dna, **kw)
            return loss

        iters = 10
        if name == "fwd":
            f = jax.jit(lambda tr, fr, b: loss_fn(tr, fr, b))
            loss = f(train_leaves, frozen_leaves, batch)
            _ = float(loss)
            t0 = time.perf_counter()
            for _ in range(iters):
                loss = f(train_leaves, frozen_leaves, batch)
            _ = float(loss)
            ms = (time.perf_counter() - t0) / iters * 1000
        else:
            # donation mirrors bench.py (required to fit remat-off at B=4)
            @functools.partial(jax.jit, donate_argnums=(0, 2))
            def step(tr, fr, opt_state, b):
                loss, grads = jax.value_and_grad(
                    lambda t: loss_fn(t, fr, b))(tr)
                updates, opt_state = tx.update(grads, opt_state, tr)
                return optax.apply_updates(tr, updates), opt_state, loss

            for _ in range(2):
                train_leaves, opt_state, loss = step(
                    train_leaves, frozen_leaves, opt_state, batch)
                _ = float(loss)
            t0 = time.perf_counter()
            for _ in range(iters):
                train_leaves, opt_state, loss = step(
                    train_leaves, frozen_leaves, opt_state, batch)
            _ = float(loss)   # chain dependency forces all steps
            ms = (time.perf_counter() - t0) / iters * 1000
        results[name] = ms
        print(f"{name:12s}: {ms:8.2f} ms/step  ({B / ms * 1000:.2f} ex/s)",
              flush=True)

    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"  delta full - {k}: {base - v:+.2f} ms")


if __name__ == "__main__":
    main()
