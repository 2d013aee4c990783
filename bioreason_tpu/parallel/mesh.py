"""Device mesh construction.

Replaces the reference's NCCL-backed process groups (DDP/DeepSpeed/accelerate,
SURVEY §2.3) with a single `jax.sharding.Mesh`:

  axes = ('data', 'fsdp', 'model')
    data  — batch (DP); gradients all-reduce over ICI automatically
    fsdp  — parameter/optimizer-state sharding (ZeRO analogue)
    model — tensor parallelism (the reference's dead HF TP plan,
            configuration_dl.py:150-158, realized as PartitionSpecs)

Multi-slice deployments put 'data' on DCN and keep 'fsdp'/'model' inside a
slice (ICI), per the standard scaling recipe.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from bioreason_tpu.config import MeshConfig

MESH_AXES = ("data", "fsdp", "model")


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp, model = cfg.fsdp, cfg.model
    data = cfg.data
    if data == -1:
        assert n % (fsdp * model) == 0, f"{n} devices not divisible by fsdp*model={fsdp * model}"
        data = n // (fsdp * model)
    assert data * fsdp * model == n, (
        f"mesh {data}x{fsdp}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, MESH_AXES)


def make_multislice_mesh(cfg: MeshConfig = MeshConfig(), devices=None,
                         slice_key=None) -> Mesh:
    """Multi-slice (pod) mesh: pure data parallelism across slices (DCN),
    fsdp/model confined to a slice (ICI) — the standard scaling recipe:
    only gradient all-reduces cross the slow inter-slice network, and they
    overlap with the backward pass.

    Layout: the leading 'data' axis is ordered slice-major (all of slice 0's
    data shards, then slice 1's, ...), so GSPMD maps the inner portion of
    the data all-reduce onto ICI and only the per-slice partials onto DCN.
    On non-TPU backends (tests: virtual CPU devices) `process_index`/ordinal
    grouping degrades gracefully to a single slice."""
    devices = devices if devices is not None else jax.devices()
    if slice_key is None:
        slice_key = lambda d: getattr(d, "slice_index",
                                      getattr(d, "process_index", 0))
    by_slice = {}
    for d in devices:
        by_slice.setdefault(slice_key(d), []).append(d)
    slices = [by_slice[k] for k in sorted(by_slice)]
    per = len(slices[0])
    assert all(len(s) == per for s in slices), "uneven slices"
    fsdp, model = cfg.fsdp, cfg.model
    assert per % (fsdp * model) == 0, (
        f"{per} devices/slice not divisible by fsdp*model={fsdp * model}")
    data_inner = per // (fsdp * model)
    arr = np.stack([np.asarray(s).reshape(data_inner, fsdp, model)
                    for s in slices])                     # [S, d, f, m]
    arr = arr.reshape(len(slices) * data_inner, fsdp, model)
    return Mesh(arr, MESH_AXES)
