"""PartitionSpec rules for model/optimizer pytrees.

The reference's parallelism (SURVEY §2.3) maps onto GSPMD:
  * DDP / ZeRO-2            -> params replicated over 'data', optimizer state
                               sharded over 'data' (zero2_sharding)
  * dead HF TP plan
    (configuration_dl.py:150-158) -> realized here: q/k/v/gate/up colwise
                               ('model' on the output dim), o/down rowwise
                               ('model' on the input dim)
  * FSDP                    -> kernels sharded over 'fsdp' on the non-TP dim

Rules are (regex, PartitionSpec) pairs matched against 'path/like/this'
param paths (first match wins). Decoder layer kernels are STACKED [L, in, out]
so specs carry a leading None for the layer axis.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = List[Tuple[str, P]]


def partition_rules_decoder(prefix: str = "") -> Rules:
    p = re.escape(prefix)
    return [
        (p + r"embed/embedding$", P("model", "fsdp")),
        (p + r"lm_head/kernel$", P("fsdp", "model")),
        (p + r"layers/attn/(q|k|v)/lora_a$", P(None, "fsdp", None)),
        (p + r"layers/attn/(q|k|v)/lora_b$", P(None, None, "model")),
        (p + r"layers/attn/o/lora_a$", P(None, "model", None)),
        (p + r"layers/attn/o/lora_b$", P(None, None, "fsdp")),
        (p + r"layers/mlp/(gate|up)/lora_a$", P(None, "fsdp", None)),
        (p + r"layers/mlp/(gate|up)/lora_b$", P(None, None, "model")),
        (p + r"layers/mlp/down/lora_a$", P(None, "model", None)),
        (p + r"layers/mlp/down/lora_b$", P(None, None, "fsdp")),
        (p + r"layers/attn/(q|k|v)/kernel$", P(None, "fsdp", "model")),
        (p + r"layers/attn/o/kernel$", P(None, "model", "fsdp")),
        (p + r"layers/mlp/(gate|up)/kernel$", P(None, "fsdp", "model")),
        (p + r"layers/mlp/down/kernel$", P(None, "model", "fsdp")),
        # MoE (Qwen3-MoE family): EXPERT PARALLELISM — the expert bank's
        # leading E axis (after the stacked-layer axis) shards over 'model'
        # (each device owns E/n experts; GSPMD turns the dispatch/combine
        # einsums into all-to-alls) with the hidden dim over 'fsdp'. The
        # tiny router stays replicated (the `.*` fallback).
        (p + r"layers/mlp/experts/(gate|up)$", P(None, "model", "fsdp", None)),
        (p + r"layers/mlp/experts/down$", P(None, "model", None, "fsdp")),
        (p + r".*(scale|bias)$", P()),
        (p + r".*", P()),
    ]


def partition_rules_encoder(prefix: str = "") -> Rules:
    p = re.escape(prefix)
    return [
        (p + r"embed/embedding$", P(None, "fsdp")),
        (p + r"layers/attn/(q|k|v)/kernel$", P(None, "fsdp", "model")),
        (p + r"layers/attn/o/kernel$", P(None, "model", "fsdp")),
        (p + r"layers/mlp/(gate|up)/kernel$", P(None, "fsdp", "model")),
        (p + r"layers/mlp/down/kernel$", P(None, "model", "fsdp")),
        (p + r".*(scale|bias)$", P()),
        (p + r".*", P()),
    ]


def partition_rules_fusion(pp: bool = False) -> Rules:
    """pp=True: the decoder's stacked [L, ...] layer params shard one
    contiguous GPipe STAGE per device on 'model' (leading layer axis)
    instead of tensor-parallel column/row splits — required by
    parallel/pp.pp_decoder_layers' shard_map in_specs.

    The embed table is REPLICATED under pp (was P(None,'fsdp')): a
    hidden-sharded table makes the lookup's output hidden-sharded while the
    pipeline's shard_map wants it batch-sharded, and GSPMD resolves that
    reshard by involuntary full rematerialization (the r4 dryrun warning on
    `gather`, MULTICHIP_r04.json tail). Measured on the 8-dev CPU mesh A/B
    (r5): 2 involuntary-remat warnings -> 0, identical loss, step 1468 ->
    1429 ms (see BENCHMARKS.md PP paragraph). With a replicated table the
    gather is local and the batch slice is free."""
    decoder_rules = (
        [(re.escape("decoder/") + r"layers/.*", P("model"))] if pp
        else partition_rules_decoder("decoder/"))
    return (
        decoder_rules
        + ([(re.escape("decoder/") + r"embed/embedding$", P()),
            (re.escape("decoder/") + r"lm_head/kernel$", P("fsdp", None))]
           if pp else [])
        + partition_rules_encoder("encoder/")
        + [(r"dna_projection/kernel$", P("fsdp", "model")),
           (r"dna_projection/bias$", P()),
           (r".*", P())]
    )


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            return spec
    return P()


def specs_for_params(params, rules: Rules):
    """Pytree of PartitionSpecs matching `params`' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), rules), params)


def _valid_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on axes that don't divide evenly (tiny test shapes)."""
    out = []
    for i, names in enumerate(spec):
        if names is None:
            out.append(None)
            continue
        axis_names = names if isinstance(names, tuple) else (names,)
        size = int(np.prod([mesh.shape[a] for a in axis_names]))
        if i < len(shape) and shape[i] % size == 0 and shape[i] > 0:
            out.append(names)
        else:
            out.append(None)
    return P(*out)


def shardings_for_params(params, rules: Rules, mesh: Mesh):
    specs = specs_for_params(params, rules)
    return jax.tree.map(
        lambda leaf, spec: NamedSharding(mesh, _valid_spec(spec, leaf.shape, mesh)),
        params, specs)


def shard_params(params, rules: Rules, mesh: Mesh):
    """Device-put a host pytree onto the mesh according to the rules."""
    return jax.device_put(params, shardings_for_params(params, rules, mesh))


def batch_spec() -> P:
    """Batch arrays: shard the leading (batch) dim over data+fsdp."""
    return P(("data", "fsdp"))


def zero2_sharding(shape_dtype, mesh: Mesh) -> NamedSharding:
    """ZeRO-2 analogue (SURVEY §2.3 / ds_config_stage2.json): shard an
    optimizer-state leaf over 'data' on the first axis that divides evenly.
    Applied leaf-wise to `jax.eval_shape(tx.init, ...)` output, so it works
    for any optax state structure (incl. MultiSteps wrappers); XLA emits the
    reduce-scatter/all-gather DeepSpeed does by hand."""
    shape = shape_dtype.shape
    dp = mesh.shape["data"]
    names = [None] * len(shape)
    if dp > 1:
        for i, s in enumerate(shape):
            if s % dp == 0 and s >= dp:
                names[i] = "data"
                break
    return NamedSharding(mesh, P(*names))
