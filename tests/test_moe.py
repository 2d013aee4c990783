"""Qwen3-MoE decoder family: GShard-style capacity MoE + expert parallelism.

Above-parity extension (the reference uses dense Qwen3 only): the Qwen3
family includes MoE variants (30B-A3B: 128 experts, 8 active), and the
framework supports them with HF import + EP sharding over the 'model' axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.config import DecoderConfig, FusionConfig, MeshConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.qwen3 import decoder_forward, init_decoder


def _dense_moe_oracle(params, x, top_k, norm_topk_prob):
    """Every expert computed on every token, combined by top-k gates —
    the HF Qwen3MoeSparseMoeBlock semantics, no capacity concept."""
    n, h = x.shape
    router = np.asarray(params["router"]["kernel"], np.float32)
    logits = x @ router
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    if norm_topk_prob:
        vals = vals / vals.sum(-1, keepdims=True)
    gate_w = np.asarray(params["experts"]["gate"], np.float32)
    up_w = np.asarray(params["experts"]["up"], np.float32)
    down_w = np.asarray(params["experts"]["down"], np.float32)
    out = np.zeros((n, h), np.float32)
    for tok in range(n):
        for j in range(top_k):
            e = idx[tok, j]
            g = x[tok] @ gate_w[e]
            u = x[tok] @ up_w[e]
            y = (np.asarray(jax.nn.silu(jnp.asarray(g))) * u) @ down_w[e]
            out[tok] += vals[tok, j] * y
    return out


class TestMoELayer:
    def test_matches_dense_oracle_lossless_capacity(self):
        rng = jax.random.PRNGKey(0)
        d, e, inter, k = 16, 4, 32, 2
        params = L.moe_init(rng, d, e, inter)
        x = np.random.default_rng(0).standard_normal((2, 6, d)).astype(np.float32)
        # capacity_factor >= E/k guarantees no token drops -> exact parity
        got = L.moe_apply(params, jnp.asarray(x), top_k=k, norm_topk_prob=True,
                          dtype=jnp.float32, capacity_factor=float(e) / k)
        want = _dense_moe_oracle(params, x.reshape(-1, d), k, True)
        np.testing.assert_allclose(np.asarray(got).reshape(-1, d), want,
                                   atol=1e-4, rtol=1e-4)

    def test_norm_topk_prob_false(self):
        rng = jax.random.PRNGKey(1)
        params = L.moe_init(rng, 8, 4, 16)
        x = np.random.default_rng(1).standard_normal((1, 5, 8)).astype(np.float32)
        got = L.moe_apply(params, jnp.asarray(x), top_k=2, norm_topk_prob=False,
                          dtype=jnp.float32, capacity_factor=2.0)
        want = _dense_moe_oracle(params, x.reshape(-1, 8), 2, False)
        np.testing.assert_allclose(np.asarray(got).reshape(-1, 8), want,
                                   atol=1e-4, rtol=1e-4)

    def test_capacity_drops_tokens(self):
        # capacity 'top_k' floor with many tokens routed to one expert:
        # overflow tokens contribute zero instead of erroring
        rng = jax.random.PRNGKey(2)
        params = L.moe_init(rng, 8, 4, 16)
        x = np.ones((1, 32, 8), np.float32)       # identical tokens, same route
        out = L.moe_apply(params, jnp.asarray(x), top_k=1, norm_topk_prob=True,
                          dtype=jnp.float32, capacity_factor=0.25)
        out = np.asarray(out)[0]
        assert np.allclose(out[-1], 0.0)           # dropped (past capacity)
        assert not np.allclose(out[0], 0.0)        # kept


class TestMoEInt8:
    def test_int8_experts_close_to_float(self):
        """quantize_frozen_int8 covers the [E,in,out] expert banks
        (per-(expert, out-channel) scales); moe_apply consumes them with the
        convert fused into the dispatch einsums."""
        from bioreason_tpu.train.quant import quantize_frozen_int8
        rng = jax.random.PRNGKey(0)
        d, e, inter, k = 16, 4, 32, 2
        params = L.moe_init(rng, d, e, inter)
        x = np.random.default_rng(1).standard_normal((2, 6, d)).astype(np.float32)
        want = L.moe_apply(params, jnp.asarray(x), top_k=k, dtype=jnp.float32,
                           capacity_factor=float(e) / k)
        qtree = quantize_frozen_int8({"decoder": {"mlp": params}})["decoder"]["mlp"]
        assert qtree["experts"]["gate"]["q"].dtype == jnp.int8
        assert qtree["experts"]["gate"]["scale"].shape == (e, 1, inter)
        assert qtree["experts"]["down"]["scale"].shape == (e, 1, d)
        got = L.moe_apply(qtree, jnp.asarray(x), top_k=k, dtype=jnp.float32,
                          capacity_factor=float(e) / k)
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 0.05 * np.abs(np.asarray(want)).max(), err
        # routing must be identical (router stays float): same experts picked
        assert np.isfinite(np.asarray(got)).all()

    def test_int8_moe_decoder_decodes(self):
        """Serving path: a fully int8-quantized MoE decoder still generates
        deterministically (engine prefill+decode)."""
        from bioreason_tpu.generate import GenerationEngine
        from bioreason_tpu.models import init_fusion
        from bioreason_tpu.train.quant import quantize_frozen_int8
        cfg = FusionConfig.tiny(text_vocab=64)
        cfg = dataclasses.replace(cfg, decoder=DecoderConfig.tiny_moe(64))
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        qparams = quantize_frozen_int8(params, include_embed=True)
        ids = np.array([[3, 5, 9, 11]], np.int32)
        mask = np.ones_like(ids)
        engine = GenerationEngine(cfg, eos_token_id=7)
        t1, _ = engine.generate(qparams, ids, mask, greedy=True, max_new_tokens=4)
        t2, _ = engine.generate(qparams, ids, mask, greedy=True, max_new_tokens=4)
        np.testing.assert_array_equal(t1, t2)


class TestMoEDecoder:
    def test_forward_and_engine_decode(self):
        cfg = FusionConfig.tiny(text_vocab=64)
        cfg = dataclasses.replace(cfg, decoder=DecoderConfig.tiny_moe(64))
        from bioreason_tpu.models import init_fusion
        from bioreason_tpu.generate import GenerationEngine
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        assert "experts" in jax.tree_util.tree_structure(
            params["decoder"]["layers"]["mlp"]).__repr__() or \
            "experts" in params["decoder"]["layers"]["mlp"]
        ids = np.array([[3, 5, 9, 11]], np.int32)
        mask = np.ones_like(ids)
        logits, _ = decoder_forward(params["decoder"], cfg.decoder,
                                    input_ids=jnp.asarray(ids),
                                    attention_mask=jnp.asarray(mask))
        assert np.isfinite(np.asarray(logits)).all()
        engine = GenerationEngine(cfg, eos_token_id=7)
        toks, m = engine.generate(params, ids, mask, greedy=True, max_new_tokens=4)
        toks2, _ = engine.generate(params, ids, mask, greedy=True, max_new_tokens=4)
        np.testing.assert_array_equal(toks, toks2)
        # grouped decode path exercises the MoE in decode steps too
        tg, _ = engine.generate(params, ids, mask, greedy=True,
                                max_new_tokens=4, group_size=2)
        assert tg.shape == (2, 4)

    def test_ep_sharded_matches_unsharded(self):
        from bioreason_tpu.parallel import make_mesh
        from bioreason_tpu.parallel.partition import (partition_rules_fusion,
                                                      shardings_for_params)
        cfg = FusionConfig.tiny(text_vocab=64)
        cfg = dataclasses.replace(cfg, decoder=DecoderConfig.tiny_moe(64))
        from bioreason_tpu.models import init_fusion
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(0).integers(0, 64, (4, 12)).astype(np.int32)
        mask = np.ones_like(ids)
        ref, _ = decoder_forward(params["decoder"], cfg.decoder,
                                 input_ids=jnp.asarray(ids),
                                 attention_mask=jnp.asarray(mask))
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
        sharded = jax.device_put(
            params, shardings_for_params(params, partition_rules_fusion(), mesh))
        ep_spec = sharded["decoder"]["layers"]["mlp"]["experts"]["gate"].sharding.spec
        assert "model" in str(ep_spec), ep_spec   # experts really sharded (EP)
        got, _ = jax.jit(lambda p, i, m: decoder_forward(
            p, cfg.decoder, input_ids=i, attention_mask=m))(
                sharded["decoder"], jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


class TestMoEGoldenParity:
    def test_matches_hf_qwen3_moe(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
        from bioreason_tpu.utils.pretrained import load_pretrained_decoder

        torch.manual_seed(0)
        hf_cfg = Qwen3MoeConfig(
            vocab_size=96, hidden_size=32, intermediate_size=48,
            moe_intermediate_size=24, num_experts=4, num_experts_per_tok=2,
            norm_topk_prob=True, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
            attention_dropout=0.0)
        model = Qwen3MoeForCausalLM(hf_cfg).eval()
        path = str(tmp_path)
        model.save_pretrained(path)

        # lossless capacity so parity is exact (HF has no capacity concept)
        cfg, params = load_pretrained_decoder(
            path, dtype="float32", attention_impl="xla", remat=False,
            moe_capacity_factor=2.0)
        assert cfg.num_experts == 4 and cfg.moe_intermediate_size == 24

        ids = np.random.default_rng(3).integers(0, 96, (2, 10)).astype(np.int64)
        with torch.no_grad():
            want = model(input_ids=torch.tensor(ids)).logits.numpy()
        got, _ = decoder_forward(params, cfg, input_ids=jnp.asarray(ids, jnp.int32),
                                 attention_mask=jnp.ones((2, 10), jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)
