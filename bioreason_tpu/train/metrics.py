"""Metrics logging: JSONL + stdout, wandb-compatible when available.

The reference logs everything to wandb (SURVEY §5 observability). Here the
always-on sink is a JSONL file (one row per log call) plus optional wandb
mirroring when the package + env are present. Also provides `StepTimer` for
the per-step timing / examples-per-sec the reference lacks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "bioreason-tpu", run_name: Optional[str] = None,
                 config: Optional[Dict] = None, quiet: bool = False):
        self.quiet = quiet
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name,
                                         config=config, resume="allow")
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        row = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
               for k, v in metrics.items()}
        if step is not None:
            row["step"] = step
        row["time"] = time.time()
        if self._jsonl:
            self._jsonl.write(json.dumps(row) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)
        if not self.quiet:
            parts = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in row.items() if k != "time")
            print(parts, flush=True)

    def log_table(self, name: str, columns, rows, step: Optional[int] = None):
        """Structured table (wandb Table when available, JSONL rows always) —
        the reference's generation/completions tables
        (train_dna_qwen.py:317-328, grpo_trainer.py:718-738)."""
        if self._jsonl:
            self._jsonl.write(json.dumps({"table": name, "columns": list(columns),
                                          "rows": rows, "step": step}) + "\n")
            self._jsonl.flush()
        if self._wandb:
            try:
                import wandb
                self._wandb.log({name: wandb.Table(columns=list(columns), data=rows)},
                                step=step)
            except Exception:
                pass

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
