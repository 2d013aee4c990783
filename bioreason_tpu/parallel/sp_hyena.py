"""Sequence parallelism for the Evo2/StripedHyena tower (models/evo2.py).

The reference runs Evo2 through CUDA kernels on one GPU per sequence
(dna_llm.py:86-90, :127-146) and handles long DNA purely by truncation;
there is no sequence parallelism anywhere in it (SURVEY §5 long-context).
parallel/sp.py covers the NT/ESM attention encoder; this module covers the
hyena operator family so the Evo2 tower, too, can train/infer with the DNA
token axis sharded over a mesh axis — activation memory per device scales
as T/n, which is what unlocks 100k+ contexts on a fixed-HBM chip.

All three ops are EXACT (tested against the unsharded oracle to fp32
tolerance), not approximations:

* `sp_causal_conv` — explicit causal depthwise filters (the short conv K=3,
  hyena_se K=7, materialized hyena_mr K=128). A causal conv only needs the
  previous K-1 timesteps, so each device `ppermute`s its right-edge tail to
  the right neighbor (one ICI hop), prepends it, and convolves locally.
  Device 0 receives ppermute's zero-fill — exactly the causal zero pad.
  If the local chunk is shorter than the halo the op falls back to a tiled
  all-gather + local slice (correct at any chunk size).

* `sp_li_conv` — hyena_li long IMPLICIT filters in modal form
  (h[c,t] = Re(Σ_k r_ck · p_ck^t), models/evo2.py:_materialize_li_filter).
  The modal form is a diagonal state-space recurrence
  s_k[t] = p_k·s_k[t-1] + g[t],  y[t] = Re(Σ_k r_k·s_k[t]),
  so the cross-chunk dependency collapses into K complex states per channel:
  each device FFT-convolves its local chunk, computes its end-state
  E_k = Σ_t p_k^{C-1-t}·g[t], all-gathers the (tiny) [B,D,K] end-states,
  forms the prefix state S_k = Σ_{j<d} p_k^{C·(d-1-j)}·E_k^{(j)}, and adds
  the closed-form tail Re(Σ_k r_k·p_k^{t+1}·S_k). This is the TPU
  replacement for a distributed FFT: one all-gather of O(B·D·K) scalars
  instead of any cross-device FFT traffic.

* causal striped attention runs through `sp.sp_attention(causal=True)`
  (all-gather K/V, per-device chunk-offset causal mask).

Routing: models/evo2.py picks these when the hyena config's
`attention_impl` starts with "sp" and a mesh is registered via
`sp.enable_sequence_sharding` (same contract as the NT encoder path).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from bioreason_tpu.parallel import sp as _sp


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map            # jax >= 0.8
        return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)


def _seq_pad(x, n):
    """Right-pad the [B, T, C] sequence axis to a multiple of n. Exact for
    causal ops: y[t] depends only on x[<=t], and padded outputs are sliced
    off by the caller."""
    pad = (-x.shape[1]) % n
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    return x, pad


def sp_causal_conv(x: jnp.ndarray, filt: jnp.ndarray) -> jnp.ndarray:
    """Sequence-sharded causal depthwise convolution.

    x [B, T, C] (T sharded over the registered axis), filt [C, K]; same
    output shape/semantics as models/evo2._depthwise_causal_conv."""
    from bioreason_tpu.models.evo2 import _depthwise_causal_conv, _fft_causal_conv

    mesh, axis = _sp._STATE["mesh"], _sp._STATE["axis"]
    if mesh is None:
        raise RuntimeError("call enable_sequence_sharding(mesh, axis) first")
    n = mesh.shape[axis]
    k = filt.shape[-1]
    t = x.shape[1]
    x, pad = _seq_pad(x, n)
    chunk = x.shape[1] // n
    # long materialized filters (hyena_mr K=128) pay off through the FFT
    # path even on a local chunk; short ones stay direct depthwise convs
    conv = _fft_causal_conv if k > 16 else _depthwise_causal_conv

    from jax.sharding import PartitionSpec as P
    seq = P(None, axis, None)

    if chunk >= k - 1:
        def local(xs, f):
            halo = k - 1
            if halo:
                tail = xs[:, -halo:, :]
                recv = jax.lax.ppermute(
                    tail, axis, [(i, i + 1) for i in range(n - 1)])
                xs = jnp.concatenate([recv, xs], axis=1)
            return conv(xs, f)[:, k - 1:, :] if halo else conv(xs, f)
    else:
        # chunk shorter than the filter: gather the full sequence and keep
        # only the local output chunk (rare; tiny-test shapes)
        def local(xs, f):
            full = jax.lax.all_gather(xs, axis, axis=1, tiled=True)
            y = conv(full, f)
            start = jax.lax.axis_index(axis) * xs.shape[1]
            return jax.lax.dynamic_slice_in_dim(y, start, xs.shape[1], axis=1)

    out = _shard_map(local, mesh, (seq, P(None, None)), seq)(x, filt)
    return out[:, :t]


def sp_li_conv(g: jnp.ndarray, fp: Dict) -> jnp.ndarray:
    """Sequence-sharded hyena_li modal filter: exact chunked-state form.

    g [B, T, D] (T sharded), fp {"poles" [D,K,2], "residues" [D,K,2]} with
    the same stabilized-magnitude convention as _materialize_li_filter
    (mag = sigmoid(poles[...,0]), phase = poles[...,1])."""
    from bioreason_tpu.models.evo2 import _fft_causal_conv, _materialize_li_filter

    mesh, axis = _sp._STATE["mesh"], _sp._STATE["axis"]
    if mesh is None:
        raise RuntimeError("call enable_sequence_sharding(mesh, axis) first")
    n = mesh.shape[axis]
    t_orig = g.shape[1]
    g, _ = _seq_pad(g, n)

    from jax.sharding import PartitionSpec as P
    seq = P(None, axis, None)
    rep = P(None, None, None)

    def local(gs, poles, residues):
        dtype = gs.dtype
        c = gs.shape[1]
        gf = gs.astype(jnp.float32)
        # 1. local causal conv with the filter materialized to chunk length
        h = _materialize_li_filter({"poles": poles, "residues": residues}, c)
        y = _fft_causal_conv(gf, h)

        mag = jax.nn.sigmoid(poles[..., 0].astype(jnp.float32))     # [D, K]
        phase = poles[..., 1].astype(jnp.float32)
        log_mag = jnp.log(mag + 1e-12)

        def cpow(expo):
            """p^expo as (re, im) for broadcastable integer exponents."""
            m = jnp.exp(log_mag * expo)
            a = phase * expo
            return m * jnp.cos(a), m * jnp.sin(a)

        # 2. end-state E[b,d,k] = Σ_t p^{C-1-t} g[t]
        tloc = jnp.arange(c, dtype=jnp.float32)
        w_re, w_im = cpow(c - 1.0 - tloc[:, None, None])            # [C, D, K]
        e_re = jnp.einsum("btd,tdk->bdk", gf, w_re)
        e_im = jnp.einsum("btd,tdk->bdk", gf, w_im)

        # 3. prefix state S = Σ_{j<idx} p^{C·(idx-1-j)} E^{(j)}
        eg_re = jax.lax.all_gather(e_re, axis)                      # [n, B, D, K]
        eg_im = jax.lax.all_gather(e_im, axis)
        idx = jax.lax.axis_index(axis)
        j = jnp.arange(n, dtype=jnp.float32)
        d_exp = c * (idx.astype(jnp.float32) - 1.0 - j)             # [n]
        valid = (j < idx.astype(jnp.float32)).astype(jnp.float32)
        f_re, f_im = cpow(jnp.maximum(d_exp, 0.0)[:, None, None])   # [n, D, K]
        f_re = f_re * valid[:, None, None]
        f_im = f_im * valid[:, None, None]
        s_re = jnp.einsum("ndk,nbdk->bdk", f_re, eg_re) - jnp.einsum(
            "ndk,nbdk->bdk", f_im, eg_im)
        s_im = jnp.einsum("ndk,nbdk->bdk", f_re, eg_im) + jnp.einsum(
            "ndk,nbdk->bdk", f_im, eg_re)

        # 4. tail y_cross[t] = Re(Σ_k r_k · p^{t+1} · S_k)
        rr = residues[..., 0].astype(jnp.float32)
        ri = residues[..., 1].astype(jnp.float32)
        a_re = rr * s_re - ri * s_im                                 # r·S
        a_im = rr * s_im + ri * s_re
        q_re, q_im = cpow(tloc[:, None, None] + 1.0)                # [C, D, K]
        y_cross = (jnp.einsum("bdk,tdk->btd", a_re, q_re)
                   - jnp.einsum("bdk,tdk->btd", a_im, q_im))
        return (y + y_cross).astype(dtype)

    out = _shard_map(local, mesh, (seq, rep, rep), seq)(
        g, fp["poles"], fp["residues"])
    return out[:, :t_orig]
