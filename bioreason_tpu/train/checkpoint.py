"""Checkpointing: one Orbax-based story with stage-tagged metadata.

Replaces the reference's three mechanisms (SURVEY §5): Lightning
ModelCheckpoint, the GRPO `SaveWithPyTorchCallback` (reason.py:46-81) and the
SFT->GRPO state-dict remapping loader (reason.py:422-540). A checkpoint is
the full param pytree (or just the trainable leaves for LoRA runs) plus a
JSON metadata blob (stage: 'sft' | 'grpo', step, config repr).

Cross-stage handoff (the reference's three-format loader) is trivial here:
GRPO loads the SFT tree, `merge_lora`s the SFT adapters into the base, and
attaches fresh adapters — all pytree ops, no key remapping.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:                                    # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, params: Dict, step: int = 0, stage: str = "sft",
                    extra_metadata: Optional[Dict[str, Any]] = None) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    meta = {"step": step, "stage": stage, **(extra_metadata or {})}
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f)
    params = jax.tree.map(np.asarray, params)        # gather to host
    if _HAS_ORBAX:
        import shutil
        target = os.path.join(path, "params")
        if os.path.exists(target):                   # overwrite semantics
            shutil.rmtree(target)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(target, params)
        ckptr.wait_until_finished()
    else:                                            # pragma: no cover
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        arrs = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
                for p, v in flat}
        np.savez(os.path.join(path, "params.npz"), **arrs)


class AsyncSaver:
    """Checkpoint writes off the training thread.

    The training loop only pays for an on-device buffer COPY (async
    dispatch, HBM->HBM): the copy decouples the snapshot from the trainer's
    donated buffers (jitted steps donate train_leaves/opt_state — a
    background thread reading the ORIGINAL arrays would race donation and
    hit deleted buffers). The device->host gather and file I/O then run in
    a daemon thread. One in-flight save at a time; a new save (or `wait`)
    joins the previous one first.

    A failed background write (disk full, Orbax error) is captured and
    re-raised at the NEXT save()/wait() call — periodic checkpoints can
    never go silently missing while the run reports success."""

    def __init__(self):
        self._thread = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, params: Dict, step: int = 0, stage: str = "sft",
             extra_metadata: Optional[Dict[str, Any]] = None) -> None:
        import threading

        self.wait()
        snapshot = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, params)

        def run():
            try:
                save_checkpoint(path, snapshot, step=step, stage=stage,
                                extra_metadata=extra_metadata)
            except BaseException as e:       # surfaced by the next save/wait
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err


def load_checkpoint(path: str, like: Optional[Dict] = None) -> Dict:
    """Restore params. `like` (an abstract or concrete pytree) guides dtype/
    structure restoration under Orbax; required for the npz fallback only to
    validate paths."""
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "params")):
        ckptr = ocp.StandardCheckpointer()
        pdir = os.path.join(path, "params")
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
            disk_keys: set = set()
            try:
                meta = ckptr.metadata(pdir).item_metadata.tree
                disk_keys = set(meta.keys())
            except Exception:
                pass
            if ("params" in disk_keys
                    and not (isinstance(like, dict) and "params" in like)):
                # a FULL-STATE checkpoint ({params, opt_state, ...} written
                # by trainer.save — the best-k and --save_every paths) read
                # as a bare params tree (generative eval, SFT->GRPO
                # handoff): partial-restore only the params subtree, never
                # touching the optimizer bytes
                ra = jax.tree.map(
                    lambda s: ocp.RestoreArgs(restore_type=np.ndarray,
                                              dtype=s.dtype), abstract)
                r = ocp.PyTreeCheckpointer().restore(
                    pdir, item={"params": abstract}, transforms={},
                    restore_args={"params": ra})
                bad = [p for p, l in jax.tree_util.tree_leaves_with_path(
                           r["params"])
                       if isinstance(l, jax.ShapeDtypeStruct)]
                if bad:
                    # `like` carries leaves the file lacks (e.g. LoRA
                    # adapters vs a full-finetune checkpoint): raise so
                    # callers' structural fallbacks (cli/reason.py
                    # try/except) pick the right `like`
                    raise ValueError(
                        f"checkpoint {pdir} missing {len(bad)} leaves of "
                        f"the requested tree (first: {bad[0]})")
                return r["params"]
            return ckptr.restore(pdir, abstract)
        return ckptr.restore(pdir)
    data = np.load(os.path.join(path, "params.npz"))      # pragma: no cover
    out: Dict = {}
    for key, arr in data.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return out


class TopKKeeper:
    """Best-k checkpoint retention on a monitored metric.

    The reference keeps the top-2 checkpoints on `val_loss_epoch` plus
    `save_last` (Lightning ModelCheckpoint, train_dna_qwen.py:962-971;
    acc-monitored variant train_dna_only.py:402-411). Here: call
    `update(value, save_fn, step)` after each validation; if `value` ranks
    in the current top-k the checkpoint is written to `<root>/best-step<N>`
    and the now-(k+1)-th is pruned. `<root>/index.json` records the ranking
    so `best_path()` finds the winner after a restart. The reference's
    `save_last` role is covered by the trainer's periodic `--save_every`
    state checkpoint."""

    def __init__(self, root: str, k: int = 2, mode: str = "min"):
        assert mode in ("min", "max")
        self.root = os.path.abspath(root)
        self.k = k
        self.mode = mode
        self._kept: list = []                  # [(value, step, path)]
        os.makedirs(self.root, exist_ok=True)
        idx = os.path.join(self.root, "index.json")
        if os.path.exists(idx):                # resume: adopt surviving dirs
            with open(idx) as f:
                for value, step, path in json.load(f)["kept"]:
                    if os.path.isdir(path):
                        self._kept.append((value, step, path))

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def _flush_index(self):
        with open(os.path.join(self.root, "index.json"), "w") as f:
            json.dump({"monitor_mode": self.mode, "k": self.k,
                       "kept": self._kept}, f)

    def update(self, value: float, save_fn, step: int) -> Optional[str]:
        """`save_fn(path)` writes the checkpoint. Returns the path if
        `value` made the top-k, else None (nothing written)."""
        value = float(value)
        if not np.isfinite(value):          # a NaN val loss is never "best"
            return None
        if len(self._kept) >= self.k:
            worst = self._kept[-1][0]
            if not self._better(value, worst):
                return None
        path = os.path.join(self.root, f"best-step{step}")
        save_fn(path)
        self._kept.append((value, step, path))
        self._kept.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
        while len(self._kept) > self.k:
            _, _, stale = self._kept.pop()
            import shutil
            shutil.rmtree(stale, ignore_errors=True)
        self._flush_index()
        return path

    def best_path(self) -> Optional[str]:
        return self._kept[0][2] if self._kept else None


def load_metadata(path: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(path), "metadata.json")) as f:
        return json.load(f)


def sft_to_grpo_params(sft_params: Dict, rng, lora_cfg) -> Dict:
    """Cross-stage handoff (reference reason.py:422-540): merge SFT adapters
    into the base weights, then attach fresh GRPO adapters."""
    from bioreason_tpu.train.lora import attach_lora, merge_lora
    merged = merge_lora(sft_params)
    return attach_lora(rng, merged, lora_cfg)
