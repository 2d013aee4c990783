"""GRPO RL training CLI (reference entry point: reason.py:596-610).

Loads an SFT checkpoint (merging its LoRA into the base and attaching fresh
adapters — the reference's three-format checkpoint ingestion collapses to a
pytree transform, reason.py:422-540), then runs group-relative policy
optimization with rule-based rewards.

Example smoke run:
  python -m bioreason_tpu.cli.reason --decoder tiny --encoder tiny \
      --cpu_devices 8 --num_generations 2 --batch_size 4 --max_steps 2 \
      --max_completion_length 16 --max_length_dna 128
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from bioreason_tpu.cli.common import add_common_args, DECODER_PRESETS, ENCODER_PRESETS
    add_common_args(p)
    p.add_argument("--decoder", default="qwen3-0.6b", choices=sorted(DECODER_PRESETS))
    p.add_argument("--encoder", default="nt-500m", choices=sorted(ENCODER_PRESETS))
    p.add_argument("--sft_checkpoint", default=None)
    p.add_argument("--dtype", default=None,
                   help="override BOTH towers' compute dtype (must match the "
                        "SFT stage when continuing from --sft_checkpoint "
                        "trained with a non-default dtype)")
    p.add_argument("--hf_llm_dir", default=None,
                   help="local HF Qwen3 checkpoint dir (weights + tokenizer); "
                        "overrides --decoder (reference dna_llm.py:64-74)")
    p.add_argument("--hf_dna_dir", default=None,
                   help="local HF NT-v2/ESM checkpoint dir; overrides "
                        "--encoder (reference dna_llm.py:79-83)")
    p.add_argument("--max_prompt_length", type=int, default=None,
                   help="truncate prompts to this many tokens "
                        "(reference grpo_config.py:174-177)")
    p.add_argument("--reward_funcs", nargs="+",
                   default=["xmlcount", "soft_format", "correctness"])
    p.add_argument("--num_generations", type=int, default=8)
    p.add_argument("--num_iterations", type=int, default=1)
    p.add_argument("--beta", type=float, default=0.04)
    p.add_argument("--epsilon", type=float, default=0.2)
    p.add_argument("--max_completion_length", type=int, default=800)
    p.add_argument("--lora_r", type=int, default=64)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--save_every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--rollout_int8", action="store_true",
                   help="roll out with int8 base weights (+~30% decode "
                        "throughput; quantization noise makes sampling "
                        "slightly off-policy, like TRL's vLLM rollouts)")
    p.add_argument("--guided_decoding_regex", default=None,
                   help="constrain every rollout to match this regex "
                        "(vllm_guided_decoding_regex, grpo_config.py:278-280; "
                        "compiled to on-device token masks)")
    p.add_argument("--dna_kmer", type=int, default=6,
                   help="NT-path DNA tokenizer k-mer size (must match the "
                        "SFT stage; see cli/train_sft.py)")
    p.add_argument("--use_vllm", default=None,
                   help="accepted for reference-CLI compatibility and ignored: "
                        "rollouts always run on-TPU through the jitted engine "
                        "(the reference also accepts-and-ignores this, "
                        "sh_reason.sh:53)")
    args = p.parse_args(argv)

    if args.cpu_devices:
        from bioreason_tpu.utils import force_cpu_devices
        force_cpu_devices(args.cpu_devices)
    from bioreason_tpu.cli.common import apply_debug_flags
    apply_debug_flags(args)

    import jax
    from bioreason_tpu.cli.common import build_mesh, load_items
    from bioreason_tpu.config import (FusionConfig, GRPOConfig, LoRAConfig,
                                      OptimConfig, SamplingConfig)
    from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
    from bioreason_tpu.data.kegg import format_kegg_prompt_only, synthetic_kegg_items, KEGGDataset
    from bioreason_tpu.data.utils import split_dataset, truncate_dna
    from bioreason_tpu.models import init_fusion
    from bioreason_tpu.train.checkpoint import (load_checkpoint, save_checkpoint,
                                                sft_to_grpo_params)
    from bioreason_tpu.train.dataflow import repeat_random_indices
    from bioreason_tpu.train.grpo import GRPOTrainer
    from bioreason_tpu.train.metrics import MetricsLogger
    from bioreason_tpu.train.rewards import get_reward_funcs

    pretrained_params = None
    if args.hf_llm_dir:
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        if not args.hf_dna_dir:
            p.error("--hf_llm_dir requires --hf_dna_dir")
        fusion_cfg, pretrained_params, tok, dna_tok = load_pretrained_fusion(
            args.hf_llm_dir, args.hf_dna_dir,
            max_length_text=args.max_length_text,
            max_length_dna=args.max_length_dna, seed=args.seed)
        proc = BioProcessor(tok, dna_tok)
    else:
        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer(kmer=args.dna_kmer))
        fusion_cfg = FusionConfig(
            decoder=DECODER_PRESETS[args.decoder](vocab_size=tok.vocab_size),
            encoder=ENCODER_PRESETS[args.encoder](),
            dna_pad_token_id=tok.dna_pad_id,
            max_length_text=args.max_length_text, max_length_dna=args.max_length_dna)
    if args.dtype:
        import dataclasses as _dc
        fusion_cfg = _dc.replace(
            fusion_cfg,
            decoder=_dc.replace(fusion_cfg.decoder, dtype=args.dtype),
            **({"encoder": _dc.replace(fusion_cfg.encoder, dtype=args.dtype)}
               if fusion_cfg.encoder is not None else {}))

    lora_cfg = LoRAConfig(r=args.lora_r, alpha=args.lora_alpha)
    params = None
    rng = jax.random.PRNGKey(args.seed)
    if args.sft_checkpoint:
        from bioreason_tpu.config import SFTConfig
        base = init_fusion(rng, fusion_cfg)
        from bioreason_tpu.train.lora import attach_lora
        like = attach_lora(rng, base, lora_cfg)
        is_torch = (os.path.isfile(args.sft_checkpoint)
                    or (os.path.isdir(args.sft_checkpoint)
                        and not os.path.isdir(
                            os.path.join(args.sft_checkpoint, "params"))
                        and any(f.startswith("pytorch_model")
                                or f.endswith((".bin", ".ckpt", ".pt",
                                               ".safetensors"))
                                for f in os.listdir(args.sft_checkpoint))))
        if is_torch:
            # a REFERENCE BioReason torch checkpoint (PEFT / Lightning /
            # DeepSpeed / raw state dict, reason.py:422-540): ingest +
            # merge-LoRA into the repo tree, overlay onto the init tree so
            # components absent from the file (e.g. LLM-only runs) keep
            # their initialization
            from bioreason_tpu.utils.ref_ckpt import load_reference_sft
            loaded = load_reference_sft(args.sft_checkpoint, fusion_cfg)
            sft_params = {**base, **loaded}
            print(f"ingested reference torch checkpoint "
                  f"{args.sft_checkpoint} (components: {sorted(loaded)})")
        else:
            try:
                sft_params = load_checkpoint(args.sft_checkpoint, like=like)
            except Exception:
                sft_params = load_checkpoint(args.sft_checkpoint, like=base)
        params = sft_to_grpo_params(sft_params, jax.random.fold_in(rng, 2), lora_cfg)
    elif pretrained_params is not None:
        params = pretrained_params   # GRPOTrainer attaches fresh LoRA adapters

    raw = (list(KEGGDataset(args.data_dir).data) if args.data_dir
           else synthetic_kegg_items(args.n_synthetic, seq_len=512, seed=args.seed))
    raw = [truncate_dna(dict(x), args.truncate_dna_per_side) for x in raw]
    train_items, _, _ = split_dataset(raw, seed=args.seed)
    prompts = [format_kegg_prompt_only(x) for x in train_items]

    steps = args.max_steps or 100
    cfg = GRPOConfig(
        num_generations=args.num_generations, batch_size=args.batch_size,
        num_iterations=args.num_iterations, beta=args.beta, epsilon=args.epsilon,
        max_completion_length=args.max_completion_length,
        max_prompt_length=args.max_prompt_length,
        guided_decoding_regex=args.guided_decoding_regex,
        rollout_int8=args.rollout_int8,
        sampling=SamplingConfig(max_new_tokens=args.max_completion_length),
        optim=OptimConfig(learning_rate=args.learning_rate or 5e-6, total_steps=steps),
        lora=lora_cfg, seed=args.seed)

    trainer = GRPOTrainer(fusion_cfg, cfg, proc, get_reward_funcs(args.reward_funcs),
                          mesh=build_mesh(args.mesh), params=params)
    state_path = os.path.join(args.checkpoint_dir, "grpo_state")
    if args.resume and os.path.exists(state_path):
        trainer.restore(state_path)
        print(f"resumed from {state_path} at step {trainer.step_count}")
    logger = MetricsLogger(args.log_dir, use_wandb=args.wandb, config=vars(args))

    n_prompts_per_step = args.batch_size // args.num_generations
    step = 0
    epoch = 0
    while step < steps:
        for idx in repeat_random_indices(len(prompts), n_prompts_per_step,
                                         args.num_generations, args.seed, epoch):
            metrics = trainer.step([prompts[i] for i in idx])
            logger.log({f"grpo/{k}": v for k, v in metrics.items()}, step=step)
            if getattr(trainer, "last_completions", None):
                # log_completions (reference grpo_config.py:344-354, :718-738:
                # the wandb table carries step, prompt, completion, reward)
                rows = [[step, pr[-200:], c[:400], r]
                        for pr, c, r in zip(trainer.last_prompts,
                                            trainer.last_completions,
                                            trainer.last_rewards)][:4]
                logger.log_table("completions",
                                 ["step", "prompt", "completion", "reward"],
                                 rows, step=step)
            step += 1
            if args.save_every and step % args.save_every == 0:
                trainer.save(state_path, block=False)
            if step >= steps:
                break
        epoch += 1

    trainer.finish_saves()
    ckpt = os.path.join(args.checkpoint_dir, "grpo_final")
    save_checkpoint(ckpt, trainer.params, step=step, stage="grpo")
    print(f"saved checkpoint to {ckpt}")
    logger.close()
    return trainer


if __name__ == "__main__":
    main()
