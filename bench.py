"""Benchmark: SFT fusion-model training throughput on one chip.

Prints ONE JSON line:
  {"metric": "sft_examples_per_sec_per_chip", "value": N, "unit": "examples/s",
   "vs_baseline": N}

Workload mirrors the reference's headline SFT config shape (NT-500M-class
encoder + Qwen3-0.6B-class decoder, full 151936-token softmax, text len 768
incl. spliced DNA, LoRA r32, frozen DNA tower) on whatever single device JAX
exposes (the real TPU chip under the driver).

`vs_baseline` is value / A100_BASELINE_EXAMPLES_PER_SEC, where the constant
below is the BASELINE.json target ("≥2x A100 examples/sec/chip"): the
reference SFT runs ~4 examples/s/A100 at this size (HF+Lightning, bf16,
flash-attn-2), so the target ratio is >= 8.
"""

import json
import time

A100_BASELINE_EXAMPLES_PER_SEC = 4.0


def kernel_numeric_smoke():
    """On-chip flash-vs-XLA numeric check BEFORE timing (VERDICT r1 item 8):
    interpret-mode CPU tests don't enforce TPU block-tiling rules, so a
    mis-tiled kernel could produce wrong-fast numbers here. Fails loudly
    instead. Runs fwd AND bwd at a production-like shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bioreason_tpu.models.attention import xla_attention
    from bioreason_tpu.ops.flash_attention import flash_attention

    if jax.devices()[0].platform == "cpu":
        return  # smoke is for the real chip; CPU path is covered by tests
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 512, 16, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 512, 8, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 512, 8, 128)), jnp.bfloat16)
    mask = jnp.ones((2, 512), jnp.int32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, kv_mask=mask, causal=True)
                .astype(jnp.float32) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v, kv_mask=mask, causal=True)
                .astype(jnp.float32) ** 2).sum()

    out_f = jax.jit(lambda *a: flash_attention(*a, kv_mask=mask, causal=True))(q, k, v)
    out_x = jax.jit(lambda *a: xla_attention(*a, kv_mask=mask, causal=True))(q, k, v)
    fwd_err = float(jnp.abs(out_f.astype(jnp.float32)
                            - out_x.astype(jnp.float32)).max())
    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    bwd_err = max(float(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)).max())
                  for a, b in zip(gf, gx))
    assert fwd_err < 5e-2, f"flash fwd diverges from XLA on-chip: {fwd_err}"
    assert bwd_err < 5e-1, f"flash bwd diverges from XLA on-chip: {bwd_err}"
    print(f"# kernel smoke ok: fwd_err={fwd_err:.2e} bwd_err={bwd_err:.2e}")

    # banded local attention (ops/local_attention.py) vs a masked-XLA band
    # oracle — same on-chip tiling concern as flash
    from bioreason_tpu.ops.local_attention import local_attention
    window = 96

    def band_oracle(q, k, v):
        t = q.shape[1]
        i = jnp.arange(t)[:, None]
        j = jnp.arange(t)[None, :]
        band = (jnp.abs(i - j) <= window).astype(jnp.int32)
        group = q.shape[2] // k.shape[2]
        kx = jnp.repeat(k, group, axis=2)
        vx = jnp.repeat(v, group, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       kx.astype(jnp.float32)) * (q.shape[-1] ** -0.5)
        s = jnp.where(band[None, None] > 0, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vx.astype(jnp.float32))

    def loss_local(q, k, v):
        return (local_attention(q, k, v, window, block=128)
                .astype(jnp.float32) ** 2).sum()

    def loss_band(q, k, v):
        return (band_oracle(q, k, v) ** 2).sum()

    out_l = jax.jit(lambda *a: local_attention(*a, window, block=128))(q, k, v)
    out_b = jax.jit(band_oracle)(q, k, v)
    lerr = float(jnp.abs(out_l.astype(jnp.float32) - out_b).max())
    gl = jax.jit(jax.grad(loss_local, argnums=(0, 1, 2)))(q, k, v)
    gb = jax.jit(jax.grad(loss_band, argnums=(0, 1, 2)))(q, k, v)
    lbwd = max(float(jnp.abs(a.astype(jnp.float32)
                             - b.astype(jnp.float32)).max())
               for a, b in zip(gl, gb))
    assert lerr < 5e-2, f"local-attn fwd diverges on-chip: {lerr}"
    assert lbwd < 5e-1, f"local-attn bwd diverges on-chip: {lbwd}"
    print(f"# local-attn smoke ok: fwd_err={lerr:.2e} bwd_err={lbwd:.2e}")


def hyena_numeric_smoke():
    """On-chip vs host-CPU numeric check of the Evo2/hyena tower (VERDICT r4
    #2: the FFT convs + modal-pole li filters + striped attention had never
    executed on the real chip — CPU interpret-mode tests don't exercise the
    TPU FFT or tiling). Runs a small-but-real hybrid stack (all four
    operator flavors) on both backends and compares."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    if jax.devices()[0].platform == "cpu":
        return
    import dataclasses
    from bioreason_tpu.config import HyenaConfig
    from bioreason_tpu.models.evo2 import init_hyena, hyena_forward

    cfg = dataclasses.replace(
        HyenaConfig(hidden_size=256, intermediate_size=512, num_layers=4,
                    num_heads=4, attn_every=4, li_order=8,
                    medium_filter_len=32, remat=False, dtype="float32"))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(65, 85, (2, 256)), jnp.int32)
    mask = jnp.ones((2, 256), jnp.int32)
    cpu = jax.local_devices(backend="cpu")[0]
    # the CPU oracle must pin attention_impl="xla": "auto" resolves against
    # the default (TPU) platform even under backend="cpu" jit, and Pallas
    # refuses to run uninterpreted on the CPU backend
    cpu_cfg = dataclasses.replace(cfg, attention_impl="xla")
    with jax.default_device(cpu):
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        want = np.asarray(jax.jit(hyena_forward, static_argnums=1,
                                  backend="cpu")(params, cpu_cfg, ids, mask))
    got = np.asarray(jax.jit(hyena_forward, static_argnums=1)(
        jax.device_put(params), cfg, jax.device_put(ids), jax.device_put(mask)))
    err = float(np.abs(got - want).max())
    rel = err / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, f"hyena tower diverges on-chip: abs {err} rel {rel}"
    print(f"# hyena smoke ok: max abs {err:.2e} rel {rel:.2e}")


def main(argv=None):
    import argparse
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--remat", default="off", choices=["off", "full", "dots"])
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--decoder", default="qwen3-0.6b",
                    choices=["qwen3-0.6b", "qwen3-1.7b", "qwen3-4b"])
    ap.add_argument("--encoder", default="nt-500m",
                    choices=["nt-500m", "evo2-1b"],
                    help="DNA tower: NT-v2-500M-class (default, the judged "
                         "bench) or the Evo2/StripedHyena-2 1B-class hybrid "
                         "(models/evo2.py; FFT convs + modal-pole li filters "
                         "+ striped attention) — the reference's BEST "
                         "configuration (README.md:86, dna_llm.py:86-90)")
    ap.add_argument("--frozen", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--ce_save", action="store_true",
                    help="fused-CE backward reuses stored bf16 chunk logits "
                         "instead of recomputing them (ops/fused_ce.py "
                         "save_logits)")
    ap.add_argument("--fuse", action="store_true",
                    help="fused qkv/gateup base kernels (train/fuse.py); "
                         "legal here because base kernels are FROZEN under "
                         "LoRA — adapters stay per-projection")
    args = ap.parse_args(argv)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    kernel_numeric_smoke()
    if args.encoder == "evo2-1b":
        hyena_numeric_smoke()

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                      LoRAConfig, OptimConfig)
    from bioreason_tpu.models import init_fusion, fusion_forward
    from bioreason_tpu.train import trainable as T
    from bioreason_tpu.train.lora import attach_lora
    from bioreason_tpu.train.optim import make_optimizer

    import dataclasses
    B, T_TEXT, L_DNA = args.batch, 768, 128
    S_DNA = 2 * B

    remat = args.remat != "off"
    policy = "dots" if args.remat == "dots" else "full"
    presets = {"qwen3-0.6b": DecoderConfig.qwen3_0_6b,
               "qwen3-1.7b": DecoderConfig.qwen3_1_7b,
               "qwen3-4b": DecoderConfig.qwen3_4b}
    if args.encoder == "evo2-1b":
        from bioreason_tpu.config import HyenaConfig
        if args.frozen == "int8":
            raise SystemExit("--encoder evo2-1b supports bf16 frozen only "
                             "(int8 expert/tower quantization targets the "
                             "NT/Qwen dense layout)")
        cfg = FusionConfig(
            decoder=dataclasses.replace(presets[args.decoder](vocab_size=151936),
                                        remat=remat, remat_policy=policy),
            encoder=EncoderConfig.tiny(),       # unused under encoder_kind=evo2
            hyena=dataclasses.replace(HyenaConfig.evo2_1b(), remat=remat),
            encoder_kind="evo2",
            dna_pad_token_id=151938,
            ce_save_logits=args.ce_save,
        )
    else:
        cfg = FusionConfig(
            decoder=dataclasses.replace(presets[args.decoder](vocab_size=151936),
                                        remat=remat, remat_policy=policy),
            encoder=dataclasses.replace(EncoderConfig.nt_v2_500m(),
                                        remat=remat, remat_policy=policy),
            dna_pad_token_id=151938,
            ce_save_logits=args.ce_save,
        )
    rng = jax.random.PRNGKey(0)
    if args.frozen == "int8":
        # init + quantize on HOST: the 4B-class fp32 init tree (16 GB) must
        # never touch the chip — only the int8/bf16 leaves go to HBM
        import contextlib
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            params = init_fusion(rng, cfg)
            params = attach_lora(jax.random.fold_in(rng, 1), params,
                                 LoRAConfig(r=32, alpha=64))
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = quantize_frozen_int8(params)
        params = jax.tree.map(
            lambda l: jax.device_put(
                np.asarray(l).astype(np.float32) if l.dtype == np.float64 else l),
            params)
    else:
        params = init_fusion(rng, cfg)
        params = attach_lora(jax.random.fold_in(rng, 1), params, LoRAConfig(r=32, alpha=64))
    if args.fuse:
        from bioreason_tpu.train.fuse import fuse_projections
        params = fuse_projections(params)
    partition = T.make_partition(params, T.LORA_TRAINABLE)
    train_leaves, frozen_leaves = T.split(partition, params)
    # frozen base float leaves in bf16 (no fp32 master needed; halves base HBM)
    frozen_leaves = [l.astype(jnp.bfloat16) if l.dtype == jnp.float32 and l.ndim >= 2
                     else l for l in frozen_leaves]
    tx, _ = make_optimizer(OptimConfig(total_steps=100))
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    opt_state = tx.init(train_leaves)

    npr = np.random.default_rng(0)
    input_ids = npr.integers(0, 150000, (B, T_TEXT)).astype(np.int32)
    dna_mask = np.ones((S_DNA, L_DNA), np.int32)
    per_item = S_DNA // B * L_DNA
    for b in range(B):
        input_ids[b, 1:1 + per_item] = cfg.dna_pad_token_id
    hi = 256 if args.encoder == "evo2-1b" else 4102   # char vs 6-mer vocab
    dna_ids = npr.integers(6, hi, (S_DNA, L_DNA)).astype(np.int32)
    attention_mask = np.ones((B, T_TEXT), np.int32)
    labels = np.where(np.arange(T_TEXT)[None] >= T_TEXT - 128, input_ids, -100)
    from bioreason_tpu.ops.fused_ce import gather_label_positions
    pos, tgt, val = gather_label_positions(labels)   # head on supervised span only
    batch = {k: jnp.asarray(v) for k, v in dict(
        input_ids=input_ids, attention_mask=attention_mask,
        dna_input_ids=dna_ids, dna_attention_mask=dna_mask,
        label_positions=pos, label_targets=tgt, label_valid=val).items()}

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step(train_leaves, frozen_leaves, opt_state, batch):
        def loss_fn(train):
            p = T.combine(partition, train, frozen_leaves)
            _, loss = fusion_forward(p, cfg, batch["input_ids"], batch["attention_mask"],
                                     batch["dna_input_ids"], batch["dna_attention_mask"],
                                     label_positions=batch["label_positions"],
                                     label_targets=batch["label_targets"],
                                     label_valid=batch["label_valid"])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(train_leaves)
        updates, opt_state = tx.update(grads, opt_state, train_leaves)
        return optax.apply_updates(train_leaves, updates), opt_state, loss

    # warmup/compile (two steps: compile + steady-state)
    for _ in range(2):
        train_leaves, opt_state, loss = step(train_leaves, frozen_leaves, opt_state, batch)
        _ = float(loss)   # force full device sync via host transfer

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        train_leaves, opt_state, loss = step(train_leaves, frozen_leaves, opt_state, batch)
    _ = float(loss)       # chain-dependency sync: all steps must have run
    dt = time.perf_counter() - t0

    examples_per_sec = B * n_steps / dt
    print(json.dumps({
        "metric": "sft_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 3),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_sec / A100_BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
