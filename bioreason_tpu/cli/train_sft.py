"""SFT fusion training CLI (reference entry point: train_dna_qwen.py:1011-1062).

Example (synthetic smoke run on virtual CPU devices):
  python -m bioreason_tpu.cli.train_sft --decoder tiny --encoder tiny \
      --cpu_devices 8 --batch_size 4 --num_epochs 1 --max_length_dna 128
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from bioreason_tpu.cli.common import (add_common_args, DECODER_PRESETS,
                                          ENCODER_PRESETS, HYENA_PRESETS)
    add_common_args(p)
    p.add_argument("--decoder", default="qwen3-0.6b", choices=sorted(DECODER_PRESETS))
    p.add_argument("--encoder", default="nt-500m",
                   choices=sorted(ENCODER_PRESETS) + sorted(HYENA_PRESETS))
    p.add_argument("--dna_embedding_layer", type=int, default=-1,
                   help="Evo2 named-layer embedding tap (block index)")
    p.add_argument("--hf_llm_dir", default=None,
                   help="local HF Qwen3 checkpoint dir (weights + tokenizer); "
                        "overrides --decoder with the real pretrained tower "
                        "(reference dna_llm.py:64-74)")
    p.add_argument("--hf_dna_dir", default=None,
                   help="local HF NT-v2/ESM checkpoint dir; overrides "
                        "--encoder with the real pretrained DNA tower "
                        "(reference dna_llm.py:79-83)")
    p.add_argument("--evo2_dir", default=None,
                   help="local Evo2/StripedHyena-2 checkpoint dir (vortex "
                        "naming); overrides --encoder with the Evo2 tower "
                        "(reference dna_is_evo2, dna_llm.py:86-90); combine "
                        "with --dna_embedding_layer for the blocks.N.mlp.l3 "
                        "tap")
    p.add_argument("--llm_only", action="store_true",
                   help="paste DNA into text instead of encoder fusion")
    p.add_argument("--sp_dna", action="store_true",
                   help="sequence-parallel DNA encoder: shard the DNA token "
                        "axis over the mesh 'model' axis (parallel/sp.py) so "
                        "long contexts scale past one device's memory; "
                        "max_length_dna must divide by the model-axis size")
    p.add_argument("--dna_attention", default=None,
                   help="encoder attention override: xla | pallas | sp | "
                        "local:<W> (banded O(T*W) kernel for 100k+ contexts) "
                        "| sp_local:<W> (banded + sequence-parallel halo "
                        "exchange). Supersedes --sp_dna. The Evo2 tower's "
                        "striped attention is causal: only 'sp' applies there")
    p.add_argument("--lora_r", type=int, default=32)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--no_lora", action="store_true", help="full finetune")
    p.add_argument("--dna_kmer", type=int, default=6,
                   help="NT-path DNA tokenizer k-mer size (6 = NT-v2 vocab; "
                        "1 = base-level tokens, used by the quality "
                        "rehearsal where single-base substitutions must stay "
                        "compositional)")
    p.add_argument("--dna_model_finetune", action="store_true",
                   help="train the DNA encoder too (reference declares this "
                        "flag but torch.no_grad at dna_llm.py:121 makes it "
                        "dead — here it really unfreezes the tower; used by "
                        "the from-scratch quality rehearsal where no "
                        "pretrained encoder exists)")
    p.add_argument("--supervise_eos", action="store_true",
                   help="supervise the final assistant <|im_end|> so the "
                        "model LEARNS to stop (required for from-scratch "
                        "training; pretrained Qwen3 already stops, and the "
                        "reference collator's pad-id re-mask never "
                        "supervises it — see data/collate.py)")
    p.add_argument("--probe_markers", default=None,
                   help="JSON {name: marker_text} — at every --eval_every, "
                        "also report teacher-forced next-token accuracy at "
                        "the token AFTER each marker on the val split "
                        "(train/eval.py:teacher_forced_probe). Val loss "
                        "averages over the ~250-token template span and "
                        "hides total failure on the few input-dependent "
                        "tokens (the r4 rehearsal: val loss 0.0118 with the "
                        "two DNA-dependent decisions at chance); the probe "
                        "is the metric that actually tracks learning")
    p.add_argument("--stop_probe_acc", type=float, default=0.0,
                   help="early-stop once EVERY --probe_markers accuracy on "
                        "the val split reaches this threshold (e.g. 0.95: "
                        "converged enough to answer free-running, while "
                        "leaving headroom for a GRPO stage to improve)")
    p.add_argument("--probe_n", type=int, default=64,
                   help="val examples per probe")
    p.add_argument("--dtype", default=None,
                   help="override BOTH towers' compute dtype (e.g. float32 "
                        "for from-scratch training if bf16 blocks the "
                        "informative-token signal — see "
                        "tools/diagnose_quality.py r5 experiments)")
    p.add_argument("--focal_gamma", type=float, default=0.0,
                   help="detached focal CE weighting on the train loss "
                        "(ops/fused_ce.py): >0 concentrates gradient on "
                        "unfit tokens; for from-scratch SFT where ~250 "
                        "template tokens drown the few input-dependent ones")
    p.add_argument("--bucket", type=int, default=128)
    p.add_argument("--eval_every", type=int, default=0, help="val loss every N steps")
    p.add_argument("--sample_every", type=int, default=0,
                   help="log a sampled generation every N steps (reference "
                        "train_dna_qwen.py:217-328)")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of steps 2-4")
    p.add_argument("--save_every", type=int, default=0,
                   help="periodic full-state checkpoint (params+optimizer+step)")
    p.add_argument("--keep_top_k", type=int, default=0,
                   help="retain the k best val-loss checkpoints under "
                        "<checkpoint_dir>/best (reference ModelCheckpoint "
                        "save_top_k=2 on val_loss_epoch); needs --eval_every")
    p.add_argument("--resume", action="store_true",
                   help="resume from <checkpoint_dir>/sft_state if present")
    p.add_argument("--test_generative", action="store_true",
                   help="run the generative substring-match eval after training")
    p.add_argument("--test_labels", nargs=2, default=None,
                   metavar=("NEG", "POS"), help="binary labels for the test eval")
    p.add_argument("--max_new_tokens", type=int, default=800)
    args = p.parse_args(argv)

    if args.cpu_devices:
        from bioreason_tpu.utils import force_cpu_devices
        force_cpu_devices(args.cpu_devices)
    from bioreason_tpu.cli.common import apply_debug_flags
    apply_debug_flags(args)

    import jax
    from bioreason_tpu.cli.common import build_mesh, load_items
    from bioreason_tpu.config import (FusionConfig, LoRAConfig, OptimConfig, SFTConfig,
                                      SamplingConfig)
    from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
    from bioreason_tpu.data.collate import sft_collate
    from bioreason_tpu.generate import GenerationEngine
    from bioreason_tpu.train.checkpoint import save_checkpoint
    from bioreason_tpu.train.dataflow import batch_iterator
    from bioreason_tpu.train.eval import evaluate_generative, multilabel_substring_accuracy
    from bioreason_tpu.train.metrics import MetricsLogger, StepTimer
    from bioreason_tpu.train.sft import SFTTrainer

    from bioreason_tpu.cli.common import build_encoder_config
    init_params = None
    if args.hf_llm_dir:
        # pretrained path: real Qwen3 (+ NT-v2) towers from local HF dirs
        # (reference loads these from the hub, dna_llm.py:64-90)
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        if not args.hf_dna_dir and not args.evo2_dir and not args.llm_only:
            p.error("--hf_llm_dir requires --hf_dna_dir or --evo2_dir "
                    "(or --llm_only)")
        fusion_cfg, init_params, tok, dna_tok = load_pretrained_fusion(
            args.hf_llm_dir, args.hf_dna_dir,
            max_length_text=args.max_length_text,
            max_length_dna=args.max_length_dna, seed=args.seed,
            evo2_dir=args.evo2_dir,
            dna_embedding_layer=args.dna_embedding_layer)
        if dna_tok is None:
            dna_tok = KmerTokenizer()
        print(f"loaded pretrained towers: llm={args.hf_llm_dir} "
              f"(vocab {fusion_cfg.decoder.vocab_size}), "
              f"dna={args.evo2_dir or args.hf_dna_dir}")
    else:
        tok = ByteTextTokenizer()
        encoder_kind, enc_cfg, hyena_cfg, dna_tok = build_encoder_config(
            args.encoder, args.dna_embedding_layer)
        if args.dna_kmer != 6 and encoder_kind == "nt":
            dna_tok = KmerTokenizer(kmer=args.dna_kmer)
        fusion_cfg = FusionConfig(
            decoder=DECODER_PRESETS[args.decoder](vocab_size=tok.vocab_size),
            encoder=enc_cfg, hyena=hyena_cfg, encoder_kind=encoder_kind,
            dna_pad_token_id=tok.dna_pad_id,
            max_length_text=args.max_length_text, max_length_dna=args.max_length_dna)
    if args.dtype:
        import dataclasses as _dc
        fusion_cfg = _dc.replace(
            fusion_cfg,
            decoder=_dc.replace(fusion_cfg.decoder, dtype=args.dtype),
            **({"encoder": _dc.replace(fusion_cfg.encoder, dtype=args.dtype)}
               if fusion_cfg.encoder is not None else {}))
    dna_impl = args.dna_attention or ("sp" if args.sp_dna else None)
    if dna_impl:
        import dataclasses
        if fusion_cfg.encoder_kind == "evo2":
            # hyena tower: xla/pallas run single-device; sp/sp_pallas shard
            # the sequence axis (parallel/sp_hyena.py). The banded local
            # kernels are bidirectional-only and the tower's striped
            # attention is causal, so local:/sp_local: are rejected.
            if dna_impl.startswith("local") or dna_impl.startswith("sp_local"):
                p.error("the Evo2 tower's striped attention is causal; banded "
                        "local kernels (local:/sp_local:) are bidirectional-"
                        "only — use xla, pallas, sp or sp_pallas")
            fusion_cfg = dataclasses.replace(
                fusion_cfg, hyena=dataclasses.replace(
                    fusion_cfg.hyena, attention_impl=dna_impl))
        else:
            fusion_cfg = dataclasses.replace(
                fusion_cfg, encoder=dataclasses.replace(
                    fusion_cfg.encoder, attention_impl=dna_impl))
    proc = BioProcessor(tok, dna_tok)
    train_items, val_items, test_items = load_items(
        args.dataset_type, args.data_dir, args.n_synthetic,
        args.truncate_dna_per_side, args.seed, llm_only=args.llm_only)

    steps_per_epoch = max(1, len(train_items) // args.batch_size)
    total_steps = args.max_steps or steps_per_epoch * args.num_epochs
    sft_cfg = SFTConfig(
        batch_size=args.batch_size, grad_accum_steps=args.grad_accum_steps,
        max_length_text=args.max_length_text,
        max_length_dna=args.max_length_dna, bucket=args.bucket,
        optim=OptimConfig(learning_rate=args.learning_rate, total_steps=total_steps),
        lora=None if args.no_lora else LoRAConfig(r=args.lora_r, alpha=args.lora_alpha),
        freeze_encoder=not args.dna_model_finetune,
        focal_gamma=args.focal_gamma,
        seed=args.seed)

    mesh = build_mesh(args.mesh)
    trainer = SFTTrainer(fusion_cfg, sft_cfg, mesh=mesh, params=init_params)
    state_path = os.path.join(args.checkpoint_dir, "sft_state")
    if args.resume and os.path.exists(state_path):
        trainer.restore(state_path)
        print(f"resumed from {state_path} at step {trainer.step}")
    logger = MetricsLogger(args.log_dir, use_wandb=args.wandb, config=vars(args))
    timer = StepTimer()
    keeper = None
    if args.keep_top_k:
        # best-k retention on val loss (reference ModelCheckpoint top-2 on
        # val_loss_epoch, train_dna_qwen.py:962-971); the periodic
        # --save_every state checkpoint plays the save_last role
        from bioreason_tpu.train.checkpoint import TopKKeeper
        keeper = TopKKeeper(os.path.join(args.checkpoint_dir, "best"),
                            k=args.keep_top_k)

    collate = functools.partial(sft_collate, processor=proc,
                                max_length_text=args.max_length_text,
                                max_length_dna=args.max_length_dna,
                                bucket=args.bucket,
                                supervise_eos=args.supervise_eos)
    val_collate = collate

    from bioreason_tpu.utils.profiling import trace as profiler_trace
    import contextlib

    probe_markers = None
    probe_fwd = None
    if args.probe_markers:
        import json as _json
        from bioreason_tpu.models.fusion import fusion_forward
        from bioreason_tpu.train.eval import teacher_forced_probe
        probe_markers = _json.loads(args.probe_markers)
        probe_fwd = jax.jit(
            lambda pr, ids, am, dids, dam: fusion_forward(
                pr, fusion_cfg, ids, am, dids, dam)[0])

    step = 0
    stop_early = False
    last_kept_val = None
    prof = contextlib.nullcontext()
    from bioreason_tpu.train.dataflow import prefetch
    for batch in prefetch(batch_iterator(train_items, collate, args.batch_size,
                                         seed=args.seed, epochs=args.num_epochs)):
        if args.profile_dir and step == 2:
            prof = profiler_trace(args.profile_dir)
            prof.__enter__()
        if args.profile_dir and step == 5:
            prof.__exit__(None, None, None)
        timer.start()
        metrics = trainer.train_step(batch)
        metrics["step_time"] = timer.stop()
        metrics["examples_per_sec"] = args.batch_size / metrics["step_time"]
        logger.log({f"train/{k}": v for k, v in metrics.items()}, step=step)
        step += 1
        if args.eval_every and step % args.eval_every == 0 and val_items:
            val_losses = [trainer.eval_step(b) for b in batch_iterator(
                val_items, val_collate, args.batch_size, shuffle=False,
                epochs=1, drop_last=False)]
            if val_losses:                  # val split smaller than a batch
                val_loss = float(np.mean(val_losses))
                logger.log({"val/loss": val_loss}, step=step)
                if keeper is not None:
                    # blocking saves (an async HBM snapshot of the full-
                    # finetune params+opt state is +7.8 GB at 0.6B — measured
                    # RESOURCE_EXHAUSTED on the 15.75 GB v5e, r5), but
                    # rate-limited: r4 measured minutes per orbax write on
                    # the single host core, and early val losses improve
                    # every eval — so only save on a >=25% relative
                    # improvement over the best kept value. Top-k retention
                    # semantics are unchanged for the saves that do happen.
                    if last_kept_val is None or val_loss < 0.75 * last_kept_val:
                        kept = keeper.update(
                            val_loss,
                            lambda pth: trainer.save(pth, params_only=True),
                            step)
                        if kept:
                            last_kept_val = val_loss
                            print(f"val_loss {val_loss:.4f} in "
                                  f"top-{args.keep_top_k}: saved {kept}")
            if probe_markers and val_items:
                pm = teacher_forced_probe(
                    trainer.params, fusion_cfg, proc,
                    val_items[:args.probe_n], markers=probe_markers,
                    batch_size=args.batch_size,
                    max_length_text=args.max_length_text,
                    max_length_dna=args.max_length_dna,
                    supervise_eos=args.supervise_eos, forward_fn=probe_fwd)
                logger.log({f"val/probe_{k}": v for k, v in pm.items()},
                           step=step)
                marker_accs = {k: v for k, v in pm.items() if k != "span_acc"}
                print(f"probe @{step}: " + " ".join(
                    f"{k}={v:.2f}" for k, v in sorted(pm.items())), flush=True)
                if (args.stop_probe_acc
                        and min(marker_accs.values()) >= args.stop_probe_acc):
                    print(f"probe accuracies all >= {args.stop_probe_acc}: "
                          f"stopping at step {step}")
                    stop_early = True
                    if keeper is not None and val_losses:
                        # the stopping step IS the probe-validated model;
                        # bypass the save rate limiter so best-k includes it
                        kept = keeper.update(
                            val_loss,
                            lambda pth: trainer.save(pth, params_only=True),
                            step)
                        if kept:
                            print(f"stop-step val_loss {val_loss:.4f} "
                                  f"saved {kept}")
        if args.sample_every and step % args.sample_every == 0:
            from bioreason_tpu.data.chat_template import render_chat
            from bioreason_tpu.train.eval import _prompt_messages
            engine = GenerationEngine(fusion_cfg, eos_token_id=tok.eos_token_id)
            ex = train_items[0]
            rendered = render_chat(_prompt_messages(ex), add_generation_prompt=True)
            pout = proc(text=[rendered], batch_dna_sequences=[ex["dna_sequences"]],
                        max_length_text=args.max_length_text,
                        max_length_dna=args.max_length_dna)
            gen_ids, gen_mask = engine.generate(
                trainer.params, pout.input_ids, pout.attention_mask,
                pout.dna_input_ids, pout.dna_attention_mask,
                max_new_tokens=args.max_new_tokens)
            gen_text = tok.decode(gen_ids[0][gen_mask[0].astype(bool)],
                                  skip_special_tokens=False)
            logger.log_table("train_samples", ["step", "prompt", "generation", "answer"],
                             [[step, rendered[-200:], gen_text, ex["answer"]]], step=step)
        if args.save_every and step % args.save_every == 0:
            # async: the loop pays only an on-device snapshot copy;
            # the host gather + file write run on a background thread
            trainer.save(state_path, block=False)
        if stop_early or (args.max_steps and step >= args.max_steps):
            break

    trainer.finish_saves()
    ckpt_path = os.path.join(args.checkpoint_dir, "sft_final")
    save_checkpoint(ckpt_path, trainer.params, step=step, stage="sft",
                    extra_metadata={"decoder": args.decoder, "encoder": args.encoder})
    print(f"saved checkpoint to {ckpt_path}")

    if args.test_generative and test_items:
        engine = GenerationEngine(fusion_cfg, eos_token_id=tok.eos_token_id)
        if args.test_labels:
            labels = tuple(args.test_labels)
        else:
            # reference derivation: sorted unique answers, first = negative,
            # second = positive (train_dna_qwen.py:422-425, :662-664)
            uniq = sorted({ex["answer"].strip()
                           for ex in train_items + val_items + test_items})
            labels = tuple(uniq[:2]) if len(uniq) >= 2 else (uniq[0], uniq[0])
            print(f"derived eval labels (reference semantics): "
                  f"neg={labels[0]!r} pos={labels[1]!r}")
        res = evaluate_generative(
            engine, trainer.params, proc, test_items, labels=labels,
            sampling=SamplingConfig(max_new_tokens=args.max_new_tokens),
            max_new_tokens=args.max_new_tokens, batch_size=args.batch_size,
            csv_path=os.path.join(args.checkpoint_dir, "test_generations.csv"),
            max_length_text=args.max_length_text, max_length_dna=args.max_length_dna)
        logger.log({**res.summary(),
                    "test_substring_accuracy": multilabel_substring_accuracy(res.generations)})
    logger.close()
    return trainer


if __name__ == "__main__":
    main()
