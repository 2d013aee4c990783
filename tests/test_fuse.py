"""Fused q/k/v + gate/up projection layout (train/fuse.py).

One-time param transform concatenating per-projection base kernels into one
wide dot (MXU small-N underfill fix; see fuse_projections docstring). These
tests pin: exact-math parity on float and int8 trees, LoRA adapters applied
to the split outputs, idempotence, and the decode/cache path.
Reference role: vLLM QKVParallelLinear / MergedColumnParallelLinear
(the serving layers behind grpo_config.py:230-258)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bioreason_tpu.config import DecoderConfig, EncoderConfig, FusionConfig
from bioreason_tpu.models import init_fusion, fusion_forward
from bioreason_tpu.models.qwen3 import decoder_forward, init_decoder, init_cache
from bioreason_tpu.models.nt_encoder import encoder_forward, init_encoder
from bioreason_tpu.train.fuse import fuse_projections
from bioreason_tpu.train.lora import attach_lora
from bioreason_tpu.config import LoRAConfig
from bioreason_tpu.train.quant import quantize_frozen_int8


def _dec_cfg(**kw):
    return dataclasses.replace(DecoderConfig.tiny(), dtype="float32", **kw)


def _ids(cfg, b=2, t=24, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)


def test_decoder_fused_matches_unfused_float():
    cfg = _dec_cfg()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    fused = fuse_projections({"decoder": params})["decoder"]
    assert "qkv" in fused["layers"]["attn"] and "q" not in fused["layers"]["attn"]
    assert "gateup" in fused["layers"]["mlp"]
    ids = _ids(cfg)
    base, _ = decoder_forward(params, cfg, input_ids=ids)
    out, _ = decoder_forward(fused, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_decoder_fused_matches_unfused_int8():
    cfg = _dec_cfg()
    params = quantize_frozen_int8(
        {"decoder": init_decoder(jax.random.PRNGKey(1), cfg)})
    fused = fuse_projections(params)["decoder"]
    ids = _ids(cfg, seed=1)
    base, _ = decoder_forward(params["decoder"], cfg, input_ids=ids)
    out, _ = decoder_forward(fused, cfg, input_ids=ids)
    # int8 concat keeps per-projection scales (concat along out axis): exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_fused_lora_applied_to_splits():
    cfg = _dec_cfg()
    tree = {"decoder": init_decoder(jax.random.PRNGKey(2), cfg)}
    tree = attach_lora(jax.random.PRNGKey(3), tree, LoRAConfig(r=4, alpha=8))
    # make LoRA contribution nonzero (b init is zeros)
    tree = jax.tree.map(lambda x: x, tree)
    def bump(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "lora_b":
                    node[k] = jnp.ones_like(v) * 0.02
                else:
                    bump(v)
    bump(tree)
    fused = fuse_projections(tree)
    la = fused["decoder"]["layers"]["attn"]
    assert "q" in la and "lora_a" in la["q"] and "kernel" not in la["q"]
    ids = _ids(cfg, seed=2)
    base, _ = decoder_forward(tree["decoder"], cfg, input_ids=ids)
    out, _ = decoder_forward(fused["decoder"], cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_fuse_idempotent_and_cache_path():
    cfg = _dec_cfg()
    params = init_decoder(jax.random.PRNGKey(4), cfg)
    fused = fuse_projections({"decoder": params})
    fused2 = fuse_projections(fused)
    ids = _ids(cfg, b=1, t=8, seed=3)
    mask = jnp.ones_like(ids)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    base, c1 = decoder_forward(params, cfg, input_ids=ids, cache=cache,
                               cache_index=0, cache_mask=jnp.pad(mask, ((0, 0), (0, 8))))
    out, c2 = decoder_forward(fused2["decoder"], cfg, input_ids=ids,
                              cache=init_cache(cfg, 1, 16, jnp.float32),
                              cache_index=0,
                              cache_mask=jnp.pad(mask, ((0, 0), (0, 8))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c2[0]["k"]), np.asarray(c1[0]["k"]),
                               rtol=2e-5, atol=2e-5)


def test_encoder_fused_matches_unfused():
    cfg = dataclasses.replace(EncoderConfig.tiny(), dtype="float32")
    params = init_encoder(jax.random.PRNGKey(5), cfg)
    fused = fuse_projections({"encoder": params})["encoder"]
    attn = fused["layers"]["attn"]
    assert "qkv" in attn
    if "bias" in params["layers"]["attn"]["q"]:
        assert "bias" in attn["qkv"]
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)
    base = encoder_forward(params, cfg, ids, mask)
    out = encoder_forward(fused, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_fusion_model_fused_end_to_end():
    """Full DNA-LLM forward through fused towers (the serving prefill path)."""
    cfg = FusionConfig(
        decoder=_dec_cfg(),
        encoder=dataclasses.replace(EncoderConfig.tiny(), dtype="float32"),
        dna_pad_token_id=7)
    params = init_fusion(jax.random.PRNGKey(6), cfg)
    fused = fuse_projections(params)
    rng = np.random.default_rng(6)
    b, t, s, l = 2, 20, 4, 6
    ids = rng.integers(0, cfg.decoder.vocab_size, (b, t)).astype(np.int32)
    n_dna = (s // b) * l
    ids[:, 2:2 + n_dna] = cfg.dna_pad_token_id
    dna = rng.integers(5, cfg.encoder.vocab_size, (s, l)).astype(np.int32)
    am = np.ones((b, t), np.int32)
    dm = np.ones((s, l), np.int32)
    base, _ = fusion_forward(params, cfg, jnp.asarray(ids), jnp.asarray(am),
                             jnp.asarray(dna), jnp.asarray(dm))
    out, _ = fusion_forward(fused, cfg, jnp.asarray(ids), jnp.asarray(am),
                            jnp.asarray(dna), jnp.asarray(dm))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_unfuse_round_trip_float_and_int8():
    """unfuse(fuse(p)) restores the canonical per-projection layout exactly
    (checkpoint-export path for fused trees)."""
    from bioreason_tpu.train.fuse import unfuse_projections
    cfg = _dec_cfg()
    params = {"decoder": init_decoder(jax.random.PRNGKey(3), cfg)}
    lora = attach_lora(jax.random.PRNGKey(4), params, LoRAConfig(r=2, alpha=4))
    for tree in (params, lora, quantize_frozen_int8(params)):
        rt = unfuse_projections(fuse_projections(tree))
        flat_a = jax.tree_util.tree_leaves_with_path(tree)
        flat_b = jax.tree_util.tree_leaves_with_path(rt)
        assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
        for (pa, a), (_, b) in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    # unfusing an unfused tree is a no-op copy
    rt = unfuse_projections(params)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(params),
                               jax.tree_util.tree_leaves_with_path(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
