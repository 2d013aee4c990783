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
    joins the previous one first."""

    def __init__(self):
        self._thread = None

    def save(self, path: str, params: Dict, step: int = 0, stage: str = "sft",
             extra_metadata: Optional[Dict[str, Any]] = None) -> None:
        import threading

        self.wait()
        snapshot = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, params)

        def run():
            save_checkpoint(path, snapshot, step=step, stage=stage,
                            extra_metadata=extra_metadata)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_checkpoint(path: str, like: Optional[Dict] = None) -> Dict:
    """Restore params. `like` (an abstract or concrete pytree) guides dtype/
    structure restoration under Orbax; required for the npz fallback only to
    validate paths."""
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "params")):
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
            return ckptr.restore(os.path.join(path, "params"), abstract)
        return ckptr.restore(os.path.join(path, "params"))
    data = np.load(os.path.join(path, "params.npz"))      # pragma: no cover
    out: Dict = {}
    for key, arr in data.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return out


def load_metadata(path: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(path), "metadata.json")) as f:
        return json.load(f)


def sft_to_grpo_params(sft_params: Dict, rng, lora_cfg) -> Dict:
    """Cross-stage handoff (reference reason.py:422-540): merge SFT adapters
    into the base weights, then attach fresh GRPO adapters."""
    from bioreason_tpu.train.lora import attach_lora, merge_lora
    merged = merge_lora(sft_params)
    return attach_lora(rng, merged, lora_cfg)
