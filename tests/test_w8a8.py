"""W8A8 serving mode (cfg.act_int8): int8-activation dense on the int8 MXU.

The vLLM-style W8A8 scheme (per-token dynamic activation scales x the
existing per-output-channel weight scales) the serving engine opts into for
prefill compute. Reference role: vLLM quantized serving
(grpo_config.py:230-281)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bioreason_tpu.models import layers as L
from bioreason_tpu.train.quant import quantize_kernel_int8


def test_w8a8_dense_matches_float():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 256)).astype(np.float32) * 0.05
    x = rng.normal(size=(4, 128)).astype(np.float32)
    p8 = {"kernel": quantize_kernel_int8(w)}
    y_ref = x @ w
    y = np.asarray(L.dense(p8, jnp.asarray(x), jnp.float32, act8=True))
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.03, rel


def test_w8a8_ignored_for_float_kernels():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    x = rng.normal(size=(2, 16)).astype(np.float32)
    y = np.asarray(L.dense({"kernel": jnp.asarray(w)}, jnp.asarray(x),
                           jnp.float32, act8=True))
    np.testing.assert_allclose(y, x @ w, rtol=1e-5)


def test_w8a8_decoder_forward_close_to_dequant():
    """Full tiny decoder: act_int8 output stays near the weight-only-int8
    output (the serving accuracy trade is bounded, not structural)."""
    import dataclasses
    from bioreason_tpu.config import DecoderConfig
    from bioreason_tpu.models.qwen3 import decoder_forward, init_decoder
    cfg = DecoderConfig.tiny()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    from bioreason_tpu.train.quant import quantize_frozen_int8
    q = quantize_frozen_int8({"decoder": params})["decoder"]
    ids = np.arange(24, dtype=np.int32)[None, :] % cfg.vocab_size
    base, _ = decoder_forward(q, cfg, input_ids=jnp.asarray(ids))
    w8a8, _ = decoder_forward(
        q, dataclasses.replace(cfg, act_int8=True), input_ids=jnp.asarray(ids))
    base, w8a8 = np.asarray(base, np.float32), np.asarray(w8a8, np.float32)
    denom = np.abs(base).max() + 1e-9
    assert np.abs(w8a8 - base).max() / denom < 0.1
