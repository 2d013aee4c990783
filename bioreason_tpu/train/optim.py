"""Optimizers: AdamW + cosine schedule with linear warmup.

Reference semantics: AdamW, cosine decay, 10% warmup, grad clip 1.0
(train_dna_qwen.py:393-411, pl.Trainer gradient_clip_val=1.0 :1002).
ZeRO-2's optimizer-state sharding is NOT an optimizer concern here — it falls
out of GSPMD by giving the optax state pytree sharded PartitionSpecs
(parallel/partition.py:zero2_sharding).
"""

from __future__ import annotations

import optax

from bioreason_tpu.config import OptimConfig


def cosine_warmup_schedule(cfg: OptimConfig):
    if cfg.warmup_ratio <= 0.0:
        # no warmup: straight cosine from peak. (With warmup, step 0's lr is
        # exactly 0 — the linear ramp starts at init_value — so the FIRST
        # optimizer step is a no-op on the params; short smoke runs that
        # assert a param delta after one step must set warmup_ratio=0.)
        return optax.cosine_decay_schedule(
            init_value=cfg.learning_rate, decay_steps=max(cfg.total_steps, 1))
    warmup = max(1, int(cfg.total_steps * cfg.warmup_ratio))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=0.0,
    )


def make_optimizer(cfg: OptimConfig):
    schedule = cosine_warmup_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.skip_nonfinite_after:
        # bad-batch guard: drop updates containing NaN/Inf instead of
        # poisoning the parameters (failure-detection story, SURVEY §5)
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_after)
    return tx, schedule
