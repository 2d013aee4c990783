import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bioreason_tpu.ops.flash_attention as fa
from bioreason_tpu.models.attention import xla_attention
from bioreason_tpu.ops.flash_attention import flash_attention

# CPU tests run the kernels in interpret mode (forced automatically).


@pytest.fixture(params=[False, True], ids=["tiled_bwd", "fused_bwd"])
def single_bwd_variant(request, monkeypatch):
    """Both single-block backward schemes (tiled default vs fused one-pass —
    see _FUSED_SINGLE_BWD) must stay numerically correct."""
    monkeypatch.setattr(fa, "_FUSED_SINGLE_BWD", request.param)
    jax.clear_caches()   # the knob is read at trace time
    yield request.param
    jax.clear_caches()


def rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def make_qkv(b=2, tq=128, tk=128, hq=4, hkv=2, d=32):
    q = rand((b, tq, hq, d), 0)
    k = rand((b, tk, hkv, d), 1)
    v = rand((b, tk, hkv, d), 2)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_matches_xla_full_mask(causal):
    q, k, v = make_qkv()
    out_f = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64)
    out_x = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5, rtol=2e-5)


def test_padding_mask():
    q, k, v = make_qkv(b=2, tq=64, tk=64)
    mask = jnp.ones((2, 64), jnp.int32).at[0, 40:].set(0).at[1, 10:].set(0)
    out_f = flash_attention(q, k, v, kv_mask=mask, causal=False, block_q=32, block_k=32)
    out_x = xla_attention(q, k, v, kv_mask=mask, causal=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5, rtol=2e-5)


def test_causal_with_q_offset():
    # prefill-into-larger-cache: queries at absolute positions 0..tq-1, cache len tk
    q, k, v = make_qkv(b=1, tq=32, tk=64)
    mask = jnp.ones((1, 64), jnp.int32).at[0, 32:].set(0)
    out_f = flash_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0,
                            block_q=32, block_k=32)
    out_x = xla_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5, rtol=2e-5)


def test_non_divisible_lengths_padded():
    q, k, v = make_qkv(b=1, tq=100, tk=77, hq=2, hkv=2)
    mask = jnp.ones((1, 77), jnp.int32)
    out_f = flash_attention(q, k, v, kv_mask=mask, causal=False, block_q=64, block_k=64)
    out_x = xla_attention(q, k, v, kv_mask=mask, causal=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_xla(causal):
    q, k, v = make_qkv(b=1, tq=64, tk=64, hq=4, hkv=2, d=32)
    mask = jnp.ones((1, 64), jnp.int32).at[0, 50:].set(0)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, kv_mask=mask, causal=causal,
                                block_q=32, block_k=32) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v, kv_mask=mask, causal=causal) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_single_block_rectangular_with_offset(single_bwd_variant):
    # single-block path at tq != tk with a causal query offset
    # (prefill-into-larger-cache): explicit whole-sequence blocks
    q, k, v = make_qkv(b=1, tq=32, tk=64)
    mask = jnp.ones((1, 64), jnp.int32).at[0, 48:].set(0)
    def loss_f(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0,
                            block_q=64, block_k=64)
        return (o ** 2).sum()
    def loss_x(q, k, v):
        o = xla_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0)
        return (o ** 2).sum()
    np.testing.assert_allclose(
        flash_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0,
                        block_q=64, block_k=64),
        xla_attention(q, k, v, kv_mask=mask, causal=True, q_offset=0),
        atol=2e-5, rtol=2e-5)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)


def test_causal_row_groups_multi(single_bwd_variant):
    # T=384 -> three 128-row groups with key extents 128/256/384
    # (ops/flash_attention._row_groups); padding mask + GQA exercise the
    # per-group mask slice and the scratch dk/dv accumulation
    q, k, v = make_qkv(b=2, tq=384, tk=384, hq=4, hkv=2, d=32)
    mask = jnp.ones((2, 384), jnp.int32).at[0, 300:].set(0)

    def loss_f(q, k, v):
        return (flash_attention(q, k, v, kv_mask=mask, causal=True) ** 2).sum()

    def loss_x(q, k, v):
        return (xla_attention(q, k, v, kv_mask=mask, causal=True) ** 2).sum()

    np.testing.assert_allclose(
        flash_attention(q, k, v, kv_mask=mask, causal=True),
        xla_attention(q, k, v, kv_mask=mask, causal=True),
        atol=2e-5, rtol=2e-5)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_single_block_default_path(causal, single_bwd_variant):
    # tq == tk <= SINGLE_BLOCK_MAX with default blocks takes the
    # single-block fast path (block = whole sequence); numerics must match
    # XLA exactly like any other block choice, fwd and bwd
    q, k, v = make_qkv(b=1, tq=256, tk=256)
    mask = jnp.ones((1, 256), jnp.int32).at[:, 200:].set(0)
    out_f = flash_attention(q, k, v, kv_mask=mask, causal=causal)
    out_x = xla_attention(q, k, v, kv_mask=mask, causal=causal)
    np.testing.assert_allclose(out_f, out_x, atol=2e-5, rtol=2e-5)

    def loss_f(q, k, v):
        return (flash_attention(q, k, v, kv_mask=mask, causal=causal)
                ** 2).sum()

    def loss_x(q, k, v):
        return (xla_attention(q, k, v, kv_mask=mask, causal=causal) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)
