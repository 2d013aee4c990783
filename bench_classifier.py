"""DNA-only classifier training throughput (reference train_dna_only.py path).

NT-500M-class frozen encoder + attention pooling + MLP head over (ref, alt)
pairs — the BASELINE.json smoke workload at benchmark scale. Prints one JSON
line: examples/s/chip.
"""

import json
import time


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np

    from bioreason_tpu.config import EncoderConfig, OptimConfig
    from bioreason_tpu.train.classifier import ClassifierTrainer

    B, L = 16, 512          # 16 variant pairs, ~3kb DNA each (6-mer tokens)
    cfg = dataclasses.replace(EncoderConfig.nt_v2_500m(), remat=False)
    trainer = ClassifierTrainer(cfg, num_classes=8,
                                optim=OptimConfig(learning_rate=1e-3, total_steps=100))
    npr = np.random.default_rng(0)
    batch = {
        "ref_ids": npr.integers(6, 4102, (B, L)).astype(np.int32),
        "alt_ids": npr.integers(6, 4102, (B, L)).astype(np.int32),
        "ref_attention_mask": np.ones((B, L), np.int32),
        "alt_attention_mask": np.ones((B, L), np.int32),
        "labels": npr.integers(0, 8, B).astype(np.int32),
    }
    trainer.train_step(batch)      # compile
    trainer.train_step(batch)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        m = trainer.train_step(batch)   # train_step materializes preds (host sync)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "classifier_examples_per_sec_per_chip",
        "value": round(B * n / dt, 2),
        "unit": "examples/s",
        "vs_baseline": round((B * n / dt) / 30.0, 3),   # ~30 ex/s est. A100 reference
    }))


if __name__ == "__main__":
    main()
