"""Banded sliding-window attention (ops/local_attention.py).

Every configuration is checked against a full-precision NumPy/XLA banded
oracle — forward AND gradients (the kernel carries a custom VJP). Runs in
Pallas interpret mode on the CPU mesh; block-tiling on real TPU is smoked
by bench.py's kernel check.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.ops.local_attention import local_attention


def banded_oracle(q, k, v, window, kv_mask=None):
    """Full-materialization banded attention in fp32 (GQA grouped)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    kx = np.repeat(kf, group, axis=2)
    vx = np.repeat(vf, group, axis=2)
    s = np.einsum("bqhd,bkhd->bhqk", qf, kx) * (d ** -0.5)
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    valid = np.abs(i - j) <= window
    if kv_mask is not None:
        valid = valid[None, None] & (np.asarray(kv_mask)[:, None, None, :] > 0)
    else:
        valid = np.broadcast_to(valid[None, None], s.shape)
    s = np.where(valid, s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s) * valid
    denom = p.sum(-1, keepdims=True)
    p = p / np.where(denom == 0, 1.0, denom)
    return np.einsum("bhqk,bkhd->bqhd", p, vx)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


class TestLocalAttentionForward:
    @pytest.mark.parametrize("t,window,block", [
        (64, 8, 16),     # band narrower than a block
        (64, 16, 16),    # band == block
        (96, 40, 16),    # radius > 1
        (50, 12, 16),    # padding path (t % block != 0)
        (32, 100, 16),   # window covers everything -> full attention
    ])
    def test_matches_oracle(self, t, window, block):
        q = _rand((2, t, 4, 8), 0)
        k = _rand((2, t, 4, 8), 1)
        v = _rand((2, t, 4, 8), 2)
        got = local_attention(q, k, v, window, block=block, interpret=True)
        want = banded_oracle(q, k, v, window)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    def test_gqa_and_mask(self):
        t, window, block = 64, 10, 16
        q = _rand((2, t, 8, 8), 3)
        k = _rand((2, t, 2, 8), 4)            # 4x grouped heads
        v = _rand((2, t, 2, 8), 5)
        mask = np.ones((2, t), np.int32)
        mask[0, :9] = 0                        # left padding
        mask[1, -5:] = 0
        got = local_attention(q, k, v, window, kv_mask=jnp.asarray(mask),
                              block=block, interpret=True)
        want = banded_oracle(q, k, v, window, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    def test_fully_masked_row_is_zero(self):
        """A query whose entire band is masked out must output zeros (the
        l==0 guard), matching flash_attention's convention."""
        t, window, block = 32, 4, 16
        q = _rand((1, t, 2, 8), 6)
        mask = np.ones((1, t), np.int32)
        mask[0, :] = 0
        got = local_attention(q, q, q, window, kv_mask=jnp.asarray(mask),
                              block=block, interpret=True)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


class TestLocalAttentionGrad:
    def test_grads_match_oracle(self):
        t, window, block = 64, 12, 16
        q = _rand((2, t, 4, 8), 7)
        k = _rand((2, t, 2, 8), 8)
        v = _rand((2, t, 2, 8), 9)
        mask = np.ones((2, t), np.int32)
        mask[0, :7] = 0
        maskj = jnp.asarray(mask)

        def kernel_loss(q, k, v):
            out = local_attention(q, k, v, window, kv_mask=maskj,
                                  block=block, interpret=True)
            return (out * out).sum()

        def oracle_loss(q, k, v):
            b, tt, hq, d = q.shape
            group = hq // k.shape[2]
            kx = jnp.repeat(k, group, axis=2)
            vx = jnp.repeat(v, group, axis=2)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, kx) * (d ** -0.5)
            i = jnp.arange(tt)[:, None]
            j = jnp.arange(tt)[None, :]
            valid = (jnp.abs(i - j) <= window)[None, None] & \
                (maskj[:, None, None, :] > 0)
            s = jnp.where(valid, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            p = jnp.where(valid, p, 0.0)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, vx)
            return (out * out).sum()

        got = jax.grad(kernel_loss, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(oracle_loss, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=3e-4, rtol=3e-4, err_msg=name)


class TestRouting:
    def test_attention_impl_local(self):
        from bioreason_tpu.models.attention import attention
        t = 48
        q = _rand((1, t, 2, 8), 10)
        got = attention(q, q, q, impl="local:8")
        want = banded_oracle(q, q, q, 8)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    def test_encoder_forward_with_local_impl(self):
        import dataclasses
        from bioreason_tpu.config import EncoderConfig
        from bioreason_tpu.models.nt_encoder import encoder_forward, init_encoder
        cfg = dataclasses.replace(EncoderConfig.tiny(), attention_impl="local:16")
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(11).integers(6, 100, (2, 40)).astype(np.int32)
        out = encoder_forward(params, cfg, jnp.asarray(ids),
                              jnp.ones((2, 40), jnp.int32))
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_causal_rejected(self):
        from bioreason_tpu.models.attention import attention
        q = _rand((1, 16, 2, 8), 12)
        with pytest.raises(NotImplementedError):
            attention(q, q, q, causal=True, impl="local:4")
