"""Trainable/frozen parameter partitioning.

Replaces the reference's requires_grad bookkeeping (freeze DNA tower, LoRA-ize
text tower, unfreeze projection — train_dna_qwen.py:136-177,
grpo_trainer.py:281-289). Params are split into two flat path->leaf dicts;
the loss closes over the frozen dict as an explicit argument (no grads
computed for it) and `combine` reassembles the full tree for the model apply.
"""

from __future__ import annotations

import re
from typing import Any, List, NamedTuple, Tuple

import jax

# SFT/GRPO default: adapters + fusion projection train; everything else frozen
# (reference: projection always unfrozen, DNA tower always frozen).
LORA_TRAINABLE = r"(lora_[ab]$)|(dna_projection/(kernel|bias)$)"
FULL_FINETUNE = r"(^decoder/)|(dna_projection/)"
CLASSIFIER_HEAD = r"(^pooler/)|(^classifier/)"


class ParamPartition(NamedTuple):
    treedef: Any
    paths: List[str]
    trainable: List[bool]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k)))
    return "/".join(parts)


def make_partition(params, trainable_regex: str) -> ParamPartition:
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [_path_str(p) for p, _ in leaves_with_paths]
    pat = re.compile(trainable_regex)
    trainable = [bool(pat.search(p)) for p in paths]
    return ParamPartition(treedef, paths, trainable)


def split(partition: ParamPartition, params) -> Tuple[List, List]:
    leaves = jax.tree_util.tree_leaves(params)
    train = [l for l, t in zip(leaves, partition.trainable) if t]
    frozen = [l for l, t in zip(leaves, partition.trainable) if not t]
    return train, frozen


def combine(partition: ParamPartition, train: List, frozen: List):
    train_it, frozen_it = iter(train), iter(frozen)
    leaves = [next(train_it) if t else next(frozen_it) for t in partition.trainable]
    return jax.tree_util.tree_unflatten(partition.treedef, leaves)


def trainable_paths(partition: ParamPartition) -> List[str]:
    return [p for p, t in zip(partition.paths, partition.trainable) if t]


def num_params(leaves: List) -> int:
    return sum(int(l.size) for l in leaves)
