"""DNA-only classifier training CLI (reference: train_dna_only.py:457-501).

Example smoke run:
  python -m bioreason_tpu.cli.train_dna_only --encoder tiny --cpu_devices 8 \
      --batch_size 4 --num_epochs 2 --max_length_dna 128
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from bioreason_tpu.cli.common import add_common_args, ENCODER_PRESETS
    add_common_args(p)
    p.add_argument("--encoder", default="nt-500m", choices=sorted(ENCODER_PRESETS))
    p.add_argument("--train_just_classifier", action="store_true", default=True)
    p.add_argument("--finetune_encoder", dest="train_just_classifier",
                   action="store_false")
    p.add_argument("--encoder_lr_scale", type=float, default=0.1)
    args = p.parse_args(argv)

    if args.cpu_devices:
        from bioreason_tpu.utils import force_cpu_devices
        force_cpu_devices(args.cpu_devices)
    from bioreason_tpu.cli.common import apply_debug_flags
    apply_debug_flags(args)

    from bioreason_tpu.cli.common import build_mesh, load_items
    from bioreason_tpu.config import OptimConfig
    from bioreason_tpu.data import KmerTokenizer
    from bioreason_tpu.data.collate import classifier_collate
    from bioreason_tpu.data.kegg import synthetic_kegg_items, KEGGDataset
    from bioreason_tpu.data.utils import split_dataset, truncate_dna
    from bioreason_tpu.train.checkpoint import save_checkpoint
    from bioreason_tpu.train.classifier import ClassifierTrainer
    from bioreason_tpu.train.dataflow import batch_iterator
    from bioreason_tpu.train.metrics import MetricsLogger

    raw = (list(KEGGDataset(args.data_dir).data) if args.data_dir
           else synthetic_kegg_items(args.n_synthetic, seq_len=512, seed=args.seed))
    raw = [truncate_dna(dict(x), args.truncate_dna_per_side) for x in raw]
    train_items, val_items, test_items = split_dataset(raw, seed=args.seed)

    labels = sorted({it["answer"] for it in raw})
    label2id = {l: i for i, l in enumerate(labels)}
    print(f"{len(labels)} classes: {labels[:8]}{'...' if len(labels) > 8 else ''}")

    tok = KmerTokenizer()
    cfg = ENCODER_PRESETS[args.encoder]()
    steps = max(1, len(train_items) // args.batch_size) * args.num_epochs
    trainer = ClassifierTrainer(
        cfg, num_classes=len(labels),
        optim=OptimConfig(learning_rate=args.learning_rate or 1e-3, total_steps=steps),
        train_just_classifier=args.train_just_classifier,
        encoder_lr_scale=args.encoder_lr_scale,
        mesh=build_mesh(args.mesh), seed=args.seed)

    collate = functools.partial(classifier_collate, dna_tokenizer=tok,
                                label2id=label2id, max_length=args.max_length_dna,
                                bucket=128)
    logger = MetricsLogger(args.log_dir, use_wandb=args.wandb, config=vars(args))

    step = 0
    from bioreason_tpu.train.dataflow import prefetch
    for batch in prefetch(batch_iterator(train_items, collate, args.batch_size,
                                         seed=args.seed, epochs=args.num_epochs)):
        m = trainer.train_step(batch)
        logger.log({f"train/{k}": v for k, v in m.items()}, step=step)
        step += 1
        if args.max_steps and step >= args.max_steps:
            break

    if test_items:
        agg = []
        for batch in batch_iterator(test_items, collate, args.batch_size,
                                    shuffle=False, epochs=1, drop_last=False):
            agg.append(trainer.eval_step(batch))
        mean = {k: float(np.mean([a[k] for a in agg])) for k in agg[0]} if agg else {}
        logger.log({f"test/{k}": v for k, v in mean.items()}, step=step)

    ckpt = os.path.join(args.checkpoint_dir, "dna_only_final")
    save_checkpoint(ckpt, trainer.params, step=step, stage="classifier",
                    extra_metadata={"labels": labels})
    print(f"saved checkpoint to {ckpt}")
    logger.close()
    return trainer


if __name__ == "__main__":
    main()
