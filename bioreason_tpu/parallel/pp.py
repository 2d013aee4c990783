"""Pipeline parallelism (GPipe schedule) over the decoder's layer stack.

The reference declares a pipeline-parallel plan in its vestigial DLConfig
(reference bioreason/models/dl/configuration_dl.py:159-163) but has no PP
implementation; the published models (0.6B-4B) also don't need it. This
module provides the TPU-native mechanism for completeness of the
parallelism suite (DP/ZeRO-2, FSDP, TP, SP, EP, PP):

  * the stacked layer axis [L, ...] is sharded over a mesh axis — each
    device owns L/S contiguous layers (one pipeline stage);
  * under `shard_map`, a GPipe schedule runs M microbatches through S
    stages in M+S-1 ticks; activations hop stages with `lax.ppermute`
    (which has a transpose rule, so `jax.grad` differentiates straight
    through the pipeline — the backward pipeline falls out of AD);
  * the tick loop is a `lax.scan`, so the whole schedule is one compiled
    program with static shapes.

Bubble fraction is the textbook (S-1)/(M+S-1); pick n_micro >= 4*S for >80%
utilization. The final all-stage `psum` replicates the last stage's outputs
(simple interface; a production topology would chain the LM head on the
last stage instead).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:                                   # jax >= 0.8
    from jax import shard_map as _shard_map
    _SM_KW = {}
except ImportError:                    # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
    _SM_KW = {"check_rep": False}


# -- scoped trainer registration (same pattern as parallel/sp.py) -----------
# Model code is pure-functional and configs must stay hashable, so the mesh
# cannot live in DecoderConfig; trainers activate a `pipeline_sharding` scope
# around their step calls and `decoder_forward` routes the layer stack here
# when the scope is live.

_STATE = {"mesh": None, "axis": None, "n_micro": None}


class pipeline_sharding:
    """Scoped registration of (mesh, axis, n_micro) for GPipe execution of
    the decoder layer stack. Mirrors sp.sequence_sharding so two trainers
    with different meshes in one process can't cross-trace."""

    def __init__(self, mesh: Optional[Mesh], axis: str = "model",
                 n_micro: int = 4):
        if mesh is not None and axis not in mesh.axis_names:
            raise ValueError(f"axis {axis!r} not in mesh {mesh.axis_names}")
        self._mesh, self._axis, self._n = mesh, axis, n_micro

    def __enter__(self):
        self._prev = dict(_STATE)
        if self._mesh is not None:
            _STATE.update(mesh=self._mesh, axis=self._axis, n_micro=self._n)
        return self

    def __exit__(self, *exc):
        _STATE.update(self._prev)
        return False


def pipeline_enabled() -> bool:
    return _STATE["mesh"] is not None


def pipeline_state():
    return _STATE["mesh"], _STATE["axis"], _STATE["n_micro"]


def pp_batch_axes(mesh: Mesh, axis: str):
    """Mesh axes the batch dim is sharded over inside the pipeline's
    shard_map (every mesh axis except the pipeline-stage axis): keeps DP
    intact so the pipeline composes with data parallelism instead of
    all-gathering the batch onto every stage."""
    return tuple(a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1)


def pp_decoder_layers(stacked_layers, h, cfg, positions, attention_mask,
                      mesh: Mesh, axis: str = "model", n_micro: int = 4,
                      layer_keys=None, lora_dropout_rate: float = 0.0):
    """Run the decoder's layer stack [L, ...] as an S-stage GPipe pipeline.

    stacked_layers: the `params['layers']` pytree (leading L axis; L % S == 0).
    h: [B, T, H] embeddings (B_local % n_micro == 0, where B_local is the
    per-DP-shard batch). The batch dim stays sharded over the non-pipeline
    mesh axes. layer_keys: optional [L, 2] uint32 LoRA-dropout keys (one per
    layer, sharded with the stage's layers). Returns [B, T, H].
    """
    from bioreason_tpu.models.qwen3 import _layer_forward

    s = mesh.shape[axis]
    b, t, hid = h.shape
    l_total = jax.tree.leaves(stacked_layers)[0].shape[0]
    if l_total % s:
        raise ValueError(f"num_layers {l_total} not divisible by {s} stages")
    baxes = pp_batch_axes(mesh, axis)
    dp = 1
    for a in baxes:
        dp *= mesh.shape[a]
    if b % dp or (b // dp) % n_micro:
        raise ValueError(f"batch {b} not divisible by dp {dp} x n_micro {n_micro}")

    layer_spec = jax.tree.map(lambda _: P(axis), stacked_layers)
    bspec3 = P(baxes or None, None, None)
    bspec2 = P(baxes or None, None)
    key_spec = P(axis, None)
    if layer_keys is None:
        layer_keys = jnp.zeros((l_total, 2), jnp.uint32)

    @functools.partial(
        _shard_map, mesh=mesh,
        in_specs=(layer_spec, key_spec, bspec3, bspec2, bspec2),
        out_specs=bspec3, **_SM_KW)
    def run(lp_local, keys_local, h_all, pos_all, mask_all):
        stage = jax.lax.axis_index(axis)
        bl, t, hid = h_all.shape
        mb = h_all.reshape(n_micro, bl // n_micro, t, hid)
        pos_mb = pos_all.reshape(n_micro, bl // n_micro, t)
        mask_mb = mask_all.reshape(n_micro, bl // n_micro, t)

        def stage_fn(x, pos, mask):
            def body(carry, xs):
                lp, key = xs
                drop = ((key, lora_dropout_rate)
                        if lora_dropout_rate > 0.0 else None)
                out, _ = _layer_forward(lp, carry, cfg, pos, mask, True,
                                        lora_dropout=drop)
                return out, None
            out, _ = jax.lax.scan(body, x, (lp_local, keys_local))
            return out

        def tick(carry, ti):
            state, outs = carry
            # microbatch arriving at this stage on tick ti is (ti - stage)
            cur_mb = jnp.clip(ti - stage, 0, n_micro - 1)
            inp = jnp.where(stage == 0, mb[cur_mb], state)
            out = stage_fn(inp, pos_mb[cur_mb], mask_mb[cur_mb])
            emit = ti - (s - 1)
            valid = (emit >= 0) & (emit < n_micro)
            slot = jnp.clip(emit, 0, n_micro - 1)
            cur = jax.lax.dynamic_slice_in_dim(outs, slot, 1, 0)[0]
            upd = jnp.where(valid, out, cur)
            outs = jax.lax.dynamic_update_slice_in_dim(outs, upd[None], slot, 0)
            # hop to the next stage (last stage's output falls off the end)
            nxt = jax.lax.ppermute(out, axis, [(i, i + 1) for i in range(s - 1)])
            return (nxt, outs), None

        state0 = jnp.zeros_like(mb[0])
        outs0 = jnp.zeros_like(mb)
        # the scan carry becomes device-varying after the first ppermute;
        # mark the (replicated) zeros as varying so the carry types match
        try:
            state0 = jax.lax.pcast(state0, (axis,), to="varying")
            outs0 = jax.lax.pcast(outs0, (axis,), to="varying")
        except (AttributeError, TypeError):          # older jax: pvary
            state0 = jax.lax.pvary(state0, (axis,))
            outs0 = jax.lax.pvary(outs0, (axis,))
        (_, outs), _ = jax.lax.scan(tick, (state0, outs0),
                                    jnp.arange(n_micro + s - 1))
        # outputs are only correct on the LAST stage; replicate them
        outs = jax.lax.psum(
            jnp.where(stage == s - 1, outs, jnp.zeros_like(outs)), axis)
        return outs.reshape(bl, t, hid)

    return run(stacked_layers, layer_keys, h, positions, attention_mask)


def pp_decoder_forward(params, cfg, input_ids, attention_mask=None,
                       mesh: Optional[Mesh] = None, axis: str = "model",
                       n_micro: int = 4, return_hidden: bool = False):
    """Full decoder forward with the layer stack pipelined over `axis`.

    Training path only (no KV cache — decode steps have no layer-depth
    parallelism to exploit; use the normal engine for generation)."""
    from bioreason_tpu.models import layers as L

    dtype = jnp.dtype(cfg.dtype)
    h = L.embed(params["embed"], input_ids, dtype)
    b, t, _ = h.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    positions = L.positions_from_mask(attention_mask)
    h = pp_decoder_layers(params["layers"], h, cfg, positions, attention_mask,
                          mesh, axis=axis, n_micro=n_micro)
    h = L.rmsnorm(params["final_norm"], h, cfg.rms_norm_eps)
    return h if return_hidden else L.lm_logits(params, h)
