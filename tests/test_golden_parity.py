"""Golden numeric-parity tests against the real HF model math.

The reference's towers ARE HF models (`AutoModelForCausalLM` Qwen3 +
`AutoModelForMaskedLM` NT-v2/ESM — /root/reference/bioreason/models/dna_llm.py:64-90).
These tests build tiny randomly-initialized HF checkpoints with the installed
`transformers` (torch CPU), import them with utils/hf_import, and assert the
JAX towers reproduce the HF forward numerics. This pins down RoPE layout,
qk-norm, GQA, SwiGLU, ESM token dropout, bias handling and LayerNorm
placement — a transposed-weight or rope-convention bug fails loudly here.

All comparisons run fp32 under `jax.default_matmul_precision('highest')`
(JAX's default fp32 matmul on CPU/TPU is bf16-class, ~3e-3 relative error —
precision of the *math*, not the *structure*, is what default mode trades).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _to_jax(tree):
    return jax.tree.map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# Qwen3 decoder
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_qwen3(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM
    torch.manual_seed(0)
    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True, torch_dtype=torch.float32)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    path = tmp_path_factory.mktemp("hf_qwen3")
    model.save_pretrained(path)
    return model, str(path)


@pytest.fixture(scope="module")
def tiny_qwen3_params(tiny_qwen3):
    from bioreason_tpu.config import DecoderConfig
    from bioreason_tpu.utils.hf_import import load_hf_state_dict, import_qwen3
    _, path = tiny_qwen3
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        remat=False, attention_impl="xla", dtype="float32")
    params = _to_jax(import_qwen3(load_hf_state_dict(path), cfg))
    return cfg, params


class TestQwen3GoldenParity:
    def test_full_mask_logits(self, tiny_qwen3, tiny_qwen3_params):
        from bioreason_tpu.models.qwen3 import decoder_forward
        model, _ = tiny_qwen3
        cfg, params = tiny_qwen3_params
        ids = np.random.default_rng(0).integers(0, 128, size=(2, 10)).astype(np.int32)
        with torch.no_grad():
            hf = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            logits, _ = decoder_forward(params, cfg, input_ids=jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(logits), hf, atol=1e-4, rtol=1e-4)

    def test_left_padded_logits(self, tiny_qwen3, tiny_qwen3_params):
        """Left padding: HF gets our cumsum position ids explicitly (HF's
        default arange positions are wrong under left pad; the reference
        relies on HF generate building mask-aware positions the same way)."""
        from bioreason_tpu.models.qwen3 import decoder_forward
        model, _ = tiny_qwen3
        cfg, params = tiny_qwen3_params
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)
        mask = np.ones((2, 10), np.int32)
        mask[0, :3] = 0
        pos = np.clip(np.cumsum(mask, -1) - 1, 0, None)
        with torch.no_grad():
            hf = model(torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask, dtype=torch.long),
                       position_ids=torch.tensor(pos, dtype=torch.long)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            logits, _ = decoder_forward(params, cfg, input_ids=jnp.asarray(ids),
                                        attention_mask=jnp.asarray(mask))
        valid = mask.astype(bool)
        np.testing.assert_allclose(np.asarray(logits)[valid], hf[valid],
                                   atol=1e-4, rtol=1e-4)

    def test_kv_cache_matches_hf_incremental(self, tiny_qwen3, tiny_qwen3_params):
        """Prefill+decode through the KV cache reproduces HF full-sequence
        logits at every decoded position (the rollout-engine numerics)."""
        from bioreason_tpu.models.qwen3 import decoder_forward, init_cache
        model, _ = tiny_qwen3
        cfg, params = tiny_qwen3_params
        ids = np.random.default_rng(2).integers(0, 128, size=(1, 8)).astype(np.int32)
        with torch.no_grad():
            hf = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
            prefill = 5
            cache_mask = np.zeros((1, 16), np.int32)
            cache_mask[:, :prefill] = 1
            logits, cache = decoder_forward(
                params, cfg, input_ids=jnp.asarray(ids[:, :prefill]),
                cache=cache, cache_index=0, cache_mask=jnp.asarray(cache_mask))
            np.testing.assert_allclose(np.asarray(logits)[0, -1], hf[0, prefill - 1],
                                       atol=1e-4, rtol=1e-4)
            for t in range(prefill, 8):
                cache_mask[:, t] = 1
                pos = jnp.full((1, 1), t, jnp.int32)
                logits, cache = decoder_forward(
                    params, cfg, input_ids=jnp.asarray(ids[:, t:t + 1]),
                    positions=pos, cache=cache, cache_index=t,
                    cache_mask=jnp.asarray(cache_mask))
                np.testing.assert_allclose(np.asarray(logits)[0, 0], hf[0, t],
                                           atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# ESM / NT-v2 encoder
# ---------------------------------------------------------------------------

class TestEsmGoldenParity:
    def test_esm_rotary_gelu_bias(self, tmp_path):
        """Vanilla HF ESM (the architecture family NT-v2 belongs to): rotary,
        erf-gelu MLP with biases, token dropout, pre-LN blocks, final
        emb_layer_norm_after. Valid (non-pad) positions must match; pad rows
        are allowed to differ (ESM uses absolute arange rotary positions on
        pads; those rows are stripped before the splice — fusion.py)."""
        from transformers import EsmConfig, EsmForMaskedLM
        from bioreason_tpu.config import EncoderConfig
        from bioreason_tpu.models.nt_encoder import encoder_forward
        from bioreason_tpu.utils.hf_import import load_hf_state_dict, import_esm
        torch.manual_seed(0)
        hf_cfg = EsmConfig(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            position_embedding_type="rotary", token_dropout=True,
            emb_layer_norm_before=False, layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=512, pad_token_id=1, mask_token_id=2)
        model = EsmForMaskedLM(hf_cfg).eval()
        model.save_pretrained(tmp_path)

        params = _to_jax(import_esm(load_hf_state_dict(str(tmp_path))))
        cfg = EncoderConfig(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, rope_theta=10000.0, norm_eps=1e-12,
            use_swiglu=False, attn_bias=True, mlp_bias=True,
            token_dropout=True, mask_token_id=2,
            remat=False, attention_impl="xla", dtype="float32")

        rng = np.random.default_rng(0)
        ids = rng.integers(4, 64, size=(2, 12)).astype(np.int32)
        mask = np.ones((2, 12), np.int32)
        ids[1, 9:] = 1
        mask[1, 9:] = 0                       # right padding (NT tokenizer side)
        ids[0, 3] = 2                         # a <mask> token: exercises token_dropout
        with torch.no_grad():
            hf = model.esm(torch.tensor(ids, dtype=torch.long),
                           attention_mask=torch.tensor(mask, dtype=torch.long)
                           ).last_hidden_state.numpy()
        with jax.default_matmul_precision("highest"):
            h = encoder_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        valid = mask.astype(bool)
        np.testing.assert_allclose(np.asarray(h)[valid], hf[valid], atol=1e-4, rtol=1e-4)

    def test_nt_v2_swiglu_fused_glu_oracle(self):
        """NT-v2's remote code replaces the ESM MLP with a fused gated-linear
        unit: one `intermediate.dense` of width 2*I, silu(first half) * second
        half, biasless (add_bias_fnn=False). No HF class for it ships in
        transformers, so the oracle is an independent NumPy transcription of
        that block; import_esm must split the fused kernel into gate/up."""
        from bioreason_tpu.config import EncoderConfig
        from bioreason_tpu.models.nt_encoder import encoder_forward
        from bioreason_tpu.utils.hf_import import import_esm

        H, I, L_, V, heads = 32, 48, 2, 32, 4
        rng = np.random.default_rng(3)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.2

        state = {"esm.embeddings.word_embeddings.weight": w(V, H),
                 "esm.encoder.emb_layer_norm_after.weight": 1 + 0.1 * w(H),
                 "esm.encoder.emb_layer_norm_after.bias": 0.1 * w(H)}
        for i in range(L_):
            p = f"esm.encoder.layer.{i}"
            for nm in ["query", "key", "value"]:
                state[f"{p}.attention.self.{nm}.weight"] = w(H, H)
                state[f"{p}.attention.self.{nm}.bias"] = 0.1 * w(H)
            state[f"{p}.attention.output.dense.weight"] = w(H, H)
            state[f"{p}.attention.output.dense.bias"] = 0.1 * w(H)
            state[f"{p}.attention.LayerNorm.weight"] = 1 + 0.1 * w(H)
            state[f"{p}.attention.LayerNorm.bias"] = 0.1 * w(H)
            state[f"{p}.intermediate.dense.weight"] = w(2 * I, H)   # fused GLU
            state[f"{p}.output.dense.weight"] = w(H, I)
            state[f"{p}.LayerNorm.weight"] = 1 + 0.1 * w(H)
            state[f"{p}.LayerNorm.bias"] = 0.1 * w(H)

        params = import_esm(state)
        assert "gate" in params["layers"]["mlp"], "fused GLU was not split"
        assert params["layers"]["mlp"]["gate"]["kernel"].shape == (L_, H, I)

        ids = rng.integers(4, V, size=(2, 9)).astype(np.int32)
        mask = np.ones((2, 9), np.int32)

        # --- independent NumPy oracle (fp64) of the NT-v2 ESM block math ---
        def ln(x, wt, b, eps=1e-12):
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - mu) / np.sqrt(var + eps) * wt + b

        def rope(x, theta=10000.0):
            # NeoX rotate-half over head_dim, absolute positions
            d = x.shape[-1]
            inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
            pos = np.arange(x.shape[1])
            ang = pos[:, None] * inv[None, :]
            cos, sin = np.cos(ang)[None, :, None, :], np.sin(ang)[None, :, None, :]
            x1, x2 = np.split(x, 2, axis=-1)
            return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

        def silu(x):
            return x / (1 + np.exp(-x))

        h = state["esm.embeddings.word_embeddings.weight"][ids].astype(np.float64)
        hd = H // heads
        for i in range(L_):
            p = f"esm.encoder.layer.{i}"
            x = ln(h, state[f"{p}.attention.LayerNorm.weight"],
                   state[f"{p}.attention.LayerNorm.bias"])
            q = (x @ state[f"{p}.attention.self.query.weight"].T
                 + state[f"{p}.attention.self.query.bias"]).reshape(2, 9, heads, hd)
            k = (x @ state[f"{p}.attention.self.key.weight"].T
                 + state[f"{p}.attention.self.key.bias"]).reshape(2, 9, heads, hd)
            v = (x @ state[f"{p}.attention.self.value.weight"].T
                 + state[f"{p}.attention.self.value.bias"]).reshape(2, 9, heads, hd)
            q, k = rope(q), rope(k)
            logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            a = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(2, 9, H)
            h = h + a @ state[f"{p}.attention.output.dense.weight"].T \
                + state[f"{p}.attention.output.dense.bias"]
            x = ln(h, state[f"{p}.LayerNorm.weight"], state[f"{p}.LayerNorm.bias"])
            fused = x @ state[f"{p}.intermediate.dense.weight"].T
            g, u = np.split(fused, 2, axis=-1)
            h = h + (silu(g) * u) @ state[f"{p}.output.dense.weight"].T
        oracle = ln(h, state["esm.encoder.emb_layer_norm_after.weight"],
                    state["esm.encoder.emb_layer_norm_after.bias"])

        cfg = EncoderConfig(
            vocab_size=V, hidden_size=H, intermediate_size=I,
            num_layers=L_, num_heads=heads, rope_theta=10000.0, norm_eps=1e-12,
            use_swiglu=True, attn_bias=True, mlp_bias=False,
            remat=False, attention_impl="xla", dtype="float32")
        with jax.default_matmul_precision("highest"):
            got = encoder_forward(_to_jax(params), cfg, jnp.asarray(ids),
                                  jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), oracle, atol=1e-4, rtol=1e-4)
