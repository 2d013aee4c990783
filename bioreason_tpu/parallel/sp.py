"""Sequence parallelism (context parallelism) for the long-DNA encoder.

The reference has NO sequence parallelism: long DNA is handled by data
truncation only (truncate_dna, reference dataset/utils.py:6-20;
max_length_dna caps, processing_dl.py:123-130), so its usable DNA context is
bounded by one GPU's activation memory. SURVEY (§5 long-context) marks
context parallelism an optional extension — this is it, done the TPU way:

  * the DNA token axis is sharded over a mesh axis (default 'model');
  * every elementwise/dense op runs on the local sequence shard under GSPMD;
  * attention runs under `shard_map`: each device all-gathers K/V (bf16,
    [B, S, H, D] — small relative to the S^2 logits it avoids), computes
    attention for its LOCAL query shard with the flash/XLA kernel, and
    keeps the output sequence-sharded;
  * activation memory per device scales as S/n, so an n-way axis raises the
    trainable DNA context ~n-fold at fixed HBM.

The mesh is registered once by the trainer (`enable_sequence_sharding`)
because model code is pure-functional and configs must stay hashable;
`attention_impl="sp"` in EncoderConfig then routes encoder attention here.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

_STATE = {"mesh": None, "axis": None}


def enable_sequence_sharding(mesh: Mesh, axis: str = "model") -> None:
    """Register the mesh/axis used by `sp_attention`. Called by trainers
    before tracing; the axis must exist in the mesh."""
    if axis not in mesh.axis_names:
        raise ValueError(f"axis {axis!r} not in mesh {mesh.axis_names}")
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis


def disable_sequence_sharding() -> None:
    _STATE["mesh"] = None
    _STATE["axis"] = None


class sequence_sharding:
    """Scoped registration: activates (mesh, axis) for the dynamic extent of
    the `with` block and restores whatever was registered before. Trainers
    use this around trace/step sites so two trainers with different meshes
    in one process can't silently trace against each other's mesh (the
    failure mode of bare last-writer-wins enable_sequence_sharding)."""

    def __init__(self, mesh: Optional[Mesh], axis: str = "model"):
        if mesh is not None and axis not in mesh.axis_names:
            raise ValueError(f"axis {axis!r} not in mesh {mesh.axis_names}")
        self._mesh, self._axis = mesh, axis

    def __enter__(self):
        self._prev = (_STATE["mesh"], _STATE["axis"])
        if self._mesh is not None:
            _STATE["mesh"], _STATE["axis"] = self._mesh, self._axis
        return self

    def __exit__(self, *exc):
        _STATE["mesh"], _STATE["axis"] = self._prev
        return False


def sequence_sharding_enabled() -> bool:
    return _STATE["mesh"] is not None


def sp_axis_size() -> int:
    return _STATE["mesh"].shape[_STATE["axis"]] if sequence_sharding_enabled() else 1


def sequence_spec() -> Optional[P]:
    """PartitionSpec for [rows, seq] DNA token arrays (seq sharded)."""
    if not sequence_sharding_enabled():
        return None
    return P(None, _STATE["axis"])


def sp_attention(q, k, v, kv_mask=None, causal=False, impl="xla"):
    """Attention with the SEQUENCE axis sharded.

    q/k/v: [B, S, H, D] (S sharded over the registered axis), kv_mask [B, S].
    Each device all-gathers K/V/mask and runs the local-query attention
    kernel; output stays sequence-sharded. `causal=True` (the Evo2/hyena
    tower's striped attention layers) offsets each device's queries by its
    chunk start so query i attends to global keys j <= chunk_start + i."""
    mesh, axis = _STATE["mesh"], _STATE["axis"]
    if mesh is None:
        raise RuntimeError("call enable_sequence_sharding(mesh, axis) first")
    try:
        from jax import shard_map            # jax >= 0.8
        sm_kwargs = {}
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map
        sm_kwargs = {"check_rep": False}
    from bioreason_tpu.models.attention import attention as _attention

    if kv_mask is None:
        kv_mask = jnp.ones(q.shape[:2], jnp.int32)

    # pad the sequence axis to a multiple of the axis size (NT prepends a
    # CLS token, so lengths are often bucket+1); padded keys are masked out,
    # padded query rows are sliced off the output
    n = mesh.shape[axis]
    s = q.shape[1]
    pad = (-s) % n
    if pad:
        padq = [(0, 0), (0, pad), (0, 0), (0, 0)]
        q = jnp.pad(q, padq)
        k = jnp.pad(k, padq)
        v = jnp.pad(v, padq)
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, pad)])

    seq = P(None, axis)
    qspec = P(None, axis, None, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(qspec, qspec, qspec, seq),
        out_specs=qspec, **sm_kwargs)
    def local(q, k, v, m):
        k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        m_full = jax.lax.all_gather(m, axis, axis=1, tiled=True)
        q_offset = (jax.lax.axis_index(axis) * q.shape[1]) if causal else None
        # the Pallas kernel bakes q_offset in at trace time; a per-device
        # traced offset needs the XLA path (causal layers are 1-in-7 of the
        # hyena tower, so this costs little)
        local_impl = "xla" if causal else impl
        return _attention(q, k_full, v_full, kv_mask=m_full, causal=causal,
                          q_offset=q_offset, impl=local_impl)

    out = local(q, k, v, kv_mask)
    return out[:, :s] if pad else out


def sp_local_attention(q, k, v, window: int, kv_mask=None):
    """Banded attention (ops/local_attention.py) with the sequence axis
    sharded: each device exchanges only a `window`-token HALO with its two
    neighbors (two ppermutes) instead of all-gathering full K/V — comm
    drops from O(T) to O(W) per device, compute stays O(C·W). The band and
    the shard cut the same axis, so the composition is exact.

    q/k/v [B, S, H, D] (S sharded over the registered axis), kv_mask [B, S].
    Falls back to a gather-based banded path when the halo would exceed the
    local chunk (W >= C — tiny-test shapes)."""
    mesh, axis = _STATE["mesh"], _STATE["axis"]
    if mesh is None:
        raise RuntimeError("call enable_sequence_sharding(mesh, axis) first")
    try:
        from jax import shard_map
        # pallas_call outputs carry no VMA annotation; disable the check
        sm_kwargs = {"check_vma": False}
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map
        sm_kwargs = {"check_rep": False}
    from bioreason_tpu.ops.local_attention import local_attention

    if kv_mask is None:
        kv_mask = jnp.ones(q.shape[:2], jnp.int32)
    n = mesh.shape[axis]
    s = q.shape[1]
    pad = (-s) % n
    if pad:
        padq = [(0, 0), (0, pad), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, padq), jnp.pad(k, padq), jnp.pad(v, padq)
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, pad)])
    chunk = q.shape[1] // n

    seq = P(None, axis, None, None)
    mseq = P(None, axis)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    if window < chunk:
        def local(q, k, v, m):
            hp = window

            def halo(x):
                left = jax.lax.ppermute(
                    jax.lax.slice_in_dim(x, x.shape[1] - hp, x.shape[1], axis=1),
                    axis, fwd)                 # edge devices receive zeros
                right = jax.lax.ppermute(
                    jax.lax.slice_in_dim(x, 0, hp, axis=1), axis, bwd)
                return jnp.concatenate([left, x, right], axis=1)

            k_ext = halo(k)
            v_ext = halo(v)
            m_ext = jnp.concatenate([
                jax.lax.ppermute(m[:, -hp:], axis, fwd), m,
                jax.lax.ppermute(m[:, :hp], axis, bwd)], axis=1)
            # frame the local queries at offset hp so frame-coordinate band
            # distance equals global band distance
            qpad = [(0, 0), (hp, hp), (0, 0), (0, 0)]
            out = local_attention(jnp.pad(q, qpad), k_ext, v_ext, window,
                                  kv_mask=m_ext)
            return out[:, hp:hp + q.shape[1]]
    else:
        def local(q, k, v, m):
            idx = jax.lax.axis_index(axis)
            k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            m_full = jax.lax.all_gather(m, axis, axis=1, tiled=True)
            qz = jnp.zeros(k_full.shape[:1] + (k_full.shape[1],) + q.shape[2:],
                           q.dtype)
            qz = jax.lax.dynamic_update_slice(
                qz, q, (0, idx * q.shape[1], 0, 0))
            out = local_attention(qz, k_full, v_full, window, kv_mask=m_full)
            return jax.lax.dynamic_slice_in_dim(
                out, idx * q.shape[1], q.shape[1], axis=1)

    wrapped = functools.partial(shard_map, mesh=mesh,
                                in_specs=(seq, seq, seq, mseq),
                                out_specs=seq, **sm_kwargs)(local)
    res = wrapped(q, k, v, kv_mask)
    return res[:, :s] if pad else res


def shard_sequence(arr, mesh: Optional[Mesh] = None):
    """device_put a host [rows, seq] array with the sequence axis sharded
    (no-op passthrough when sequence sharding is off)."""
    mesh = mesh or _STATE["mesh"]
    spec = sequence_spec()
    if mesh is None or spec is None or arr is None:
        return arr
    import numpy as np
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.shape[1] % mesh.shape[_STATE["axis"]] != 0:
        return jax.device_put(arr, NamedSharding(mesh, P()))
    return jax.device_put(arr, NamedSharding(mesh, spec))
