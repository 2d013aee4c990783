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
