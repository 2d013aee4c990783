"""Quality-failure diagnosis driver (VERDICT r4 #1).

Trains a configurable fusion model from scratch on the LEARNABLE synthetic
KEGG corpus with held-out splits and tracks the teacher-forced informative-
token accuracies (train/eval.py:teacher_forced_probe) over training:

  base_acc   — argmax acc at the alt-base char in 'substitutes X'   (4-way)
  half_acc   — argmax acc at the f/s char of '{first|second} half'  (2-way)
  answer_acc — argmax acc at the first char after 'Answer: '        (8-way)
  span_acc   — argmax acc over the whole supervised span

measured on BOTH a train subsample and the test split, so each run localizes
the failure: low train accs = the model cannot even FIT the DNA-dependent
tokens (optimization/architecture); high train + low test = memorization
(needs more data); high both + low generative accuracy = a generation-path
bug. The round-4 rehearsal artifact could not distinguish these
(artifacts/rehearsal_bench.json: val loss 0.0118, generative acc 0.156).

CPU (tiny, fast):
  python tools/diagnose_quality.py --cpu_devices 1 --preset tiny \
      --items 512 --seq_len 32 --steps 1500
Chip (bench towers):
  python tools/diagnose_quality.py --preset bench --items 4096 --steps 3000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = {"base": "substitutes ", "half": " in the ", "answer": "Answer: "}


def build_corpus(n, seq_len, seed, holdout=128):
    from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_for_dna_llm
    items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(
        n + holdout, seq_len=seq_len, seed=seed, learnable=True,
        fixed_positions=True)]
    return items[:n], items[n:]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="tiny",
                    choices=["tiny", "small", "bench"],
                    help="tiny: d64/L2 towers; small: d256/L4 decoder + "
                         "d128/L4 encoder; bench: qwen3-0.6b + nt-50m")
    ap.add_argument("--items", type=int, default=512)
    ap.add_argument("--holdout", type=int, default=128)
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--focal_gamma", type=float, default=0.0)
    ap.add_argument("--attention", default=None,
                    help="override BOTH towers' attention_impl (xla|pallas). "
                         "bench presets resolve 'auto' to the Pallas flash "
                         "kernels on TPU; 'xla' isolates whether the kernel "
                         "(vs optimization) blocks the DNA-dependent tokens")
    ap.add_argument("--dtype", default=None,
                    help="override BOTH towers' compute dtype (e.g. bfloat16 "
                         "on the tiny preset isolates whether bf16 rounding "
                         "erases the informative-token signal at bench scale)")
    ap.add_argument("--probe_every", type=int, default=100)
    ap.add_argument("--probe_n", type=int, default=64)
    ap.add_argument("--supervise_eos", action="store_true", default=True)
    ap.add_argument("--no_supervise_eos", dest="supervise_eos", action="store_false")
    ap.add_argument("--cpu_devices", type=int, default=0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--gen_eval_n", type=int, default=32,
                    help="final greedy generative eval size (0 to skip)")
    ap.add_argument("--out", default=None, help="JSON artifact path")
    args = ap.parse_args(argv)

    if args.cpu_devices:
        from bioreason_tpu.utils import force_cpu_devices
        force_cpu_devices(args.cpu_devices)

    import functools

    import jax
    import numpy as np

    from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                      MeshConfig, OptimConfig, SamplingConfig,
                                      SFTConfig)
    from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
    from bioreason_tpu.data.collate import sft_collate
    from bioreason_tpu.generate import GenerationEngine
    from bioreason_tpu.parallel import make_mesh
    from bioreason_tpu.train.dataflow import batch_iterator
    from bioreason_tpu.train.eval import (evaluate_generative,
                                          multilabel_substring_accuracy,
                                          teacher_forced_probe)
    from bioreason_tpu.train.sft import SFTTrainer

    tok = ByteTextTokenizer()
    proc = BioProcessor(tok, KmerTokenizer(kmer=1))
    max_len_dna = args.seq_len + 8

    if args.preset == "tiny":
        dec = DecoderConfig.tiny(tok.vocab_size)
        enc = EncoderConfig.tiny()
    elif args.preset == "small":
        dec = DecoderConfig(vocab_size=tok.vocab_size, hidden_size=256,
                            intermediate_size=512, num_layers=4, num_heads=4,
                            num_kv_heads=2, head_dim=64, remat=False,
                            attention_impl="xla", dtype="float32")
        enc = EncoderConfig(hidden_size=128, intermediate_size=256,
                            num_layers=4, num_heads=4, remat=False,
                            attention_impl="xla", dtype="float32")
    else:
        dec = DecoderConfig.qwen3_0_6b(vocab_size=tok.vocab_size)
        enc = EncoderConfig.nt_v2_50m()
    if args.dtype or args.attention:
        import dataclasses
        over = {}
        if args.dtype:
            over["dtype"] = args.dtype
        if args.attention:
            over["attention_impl"] = args.attention
        dec = dataclasses.replace(dec, **over)
        enc = dataclasses.replace(enc, **over)
    fusion = FusionConfig(decoder=dec, encoder=enc,
                          dna_pad_token_id=tok.dna_pad_id,
                          max_length_text=512, max_length_dna=max_len_dna)

    train_items, test_items = build_corpus(args.items, args.seq_len, args.seed,
                                           args.holdout)
    print(f"[diagnose] {len(train_items)} train / {len(test_items)} test, "
          f"seq_len={args.seq_len}, preset={args.preset}, "
          f"supervise_eos={args.supervise_eos}", flush=True)

    cfg = SFTConfig(batch_size=args.batch_size, max_length_dna=max_len_dna,
                    bucket=None,
                    optim=OptimConfig(learning_rate=args.learning_rate,
                                      total_steps=args.steps,
                                      warmup_ratio=0.03),
                    lora=None, freeze_encoder=False,
                    focal_gamma=args.focal_gamma, seed=args.seed)
    mesh = make_mesh(MeshConfig(data=1)) if args.cpu_devices <= 1 else \
        make_mesh(MeshConfig(data=args.cpu_devices))
    trainer = SFTTrainer(fusion, cfg, mesh=mesh)

    collate = functools.partial(sft_collate, processor=proc,
                                max_length_text=512, max_length_dna=max_len_dna,
                                supervise_eos=args.supervise_eos)

    probe = functools.partial(
        teacher_forced_probe, fusion_cfg=fusion, processor=proc,
        markers=MARKERS, batch_size=args.batch_size, max_length_text=512,
        max_length_dna=max_len_dna, supervise_eos=args.supervise_eos)

    history = []
    step = 0
    t0 = time.time()
    it = batch_iterator(train_items, collate, args.batch_size,
                        seed=args.seed, epochs=10_000)
    for batch in it:
        m = trainer.train_step(batch)
        step += 1
        if step % args.probe_every == 0 or step == args.steps:
            tr = probe(trainer.params, examples=train_items[:args.probe_n])
            te = probe(trainer.params, examples=test_items[:args.probe_n])
            row = {"step": step, "loss": float(m["loss"]),
                   "train": tr, "test": te,
                   "wall_s": round(time.time() - t0, 1)}
            history.append(row)
            print(f"[diagnose] step {step} loss {row['loss']:.4f} | "
                  f"train base {tr['base_acc']:.2f} half {tr['half_acc']:.2f} "
                  f"ans {tr['answer_acc']:.2f} span {tr['span_acc']:.3f} | "
                  f"test base {te['base_acc']:.2f} half {te['half_acc']:.2f} "
                  f"ans {te['answer_acc']:.2f} span {te['span_acc']:.3f}",
                  flush=True)
        if step >= args.steps:
            break

    result = {"args": vars(args), "history": history}

    if args.gen_eval_n:
        engine = GenerationEngine(fusion, eos_token_id=tok.eos_token_id)
        res = evaluate_generative(
            engine, trainer.params, proc, test_items[:args.gen_eval_n],
            labels=("x", "y"), sampling=SamplingConfig(max_new_tokens=288),
            max_new_tokens=288, batch_size=args.batch_size, greedy=True,
            max_length_text=512, max_length_dna=max_len_dna)
        acc = multilabel_substring_accuracy(res.generations)
        print(f"[diagnose] generative substring accuracy: {acc:.3f}")
        for g in res.generations[:3]:
            print(f"  truth={g['ground_truth']!r}\n  gen  ={g['generation'][:300]!r}")
        result["generative_accuracy"] = acc
        result["samples"] = [
            {"truth": g["ground_truth"], "gen": g["generation"]}
            for g in res.generations[:8]]

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2)
        print(f"[diagnose] -> {args.out}")
    return result


if __name__ == "__main__":
    main()
