import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import DecoderConfig, FusionConfig, SamplingConfig
from bioreason_tpu.models import init_fusion
from bioreason_tpu.models.qwen3 import decoder_forward
from bioreason_tpu.models.fusion import fused_input_embeddings
from bioreason_tpu.generate import GenerationEngine
from bioreason_tpu.ops.sampling import sample_logits, completion_mask_from_eos

CFG = FusionConfig.tiny(text_vocab=64)
EOS = 7


def setup_module(module):
    module.PARAMS = init_fusion(jax.random.PRNGKey(0), CFG)
    module.ENGINE = GenerationEngine(CFG, eos_token_id=EOS)


def _greedy_oracle(params, cfg, input_ids, attention_mask, n_new):
    """No-cache greedy decode: full forward each step."""
    ids = jnp.asarray(input_ids)
    mask = jnp.asarray(attention_mask)
    out = []
    for _ in range(n_new):
        logits, _ = decoder_forward(params["decoder"], cfg.decoder, input_ids=ids,
                                    attention_mask=mask)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        out.append(np.asarray(nxt))
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
        mask = jnp.concatenate([mask, jnp.ones_like(nxt[:, None])], axis=1)
    return np.stack(out, axis=1)


class TestEngine:
    def test_greedy_matches_full_forward_oracle(self):
        ids = np.array([[3, 5, 9, 11], [1, 2, 3, 4]], np.int32)
        mask = np.ones_like(ids)
        toks, _ = ENGINE.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=5)
        oracle = _greedy_oracle(PARAMS, CFG, ids, mask, 5)
        # compare up to each row's first EOS (oracle doesn't stop)
        for b in range(2):
            row = toks[b]
            n = np.argmax(row == EOS) + 1 if (row == EOS).any() else len(row)
            np.testing.assert_array_equal(row[:n], oracle[b, :n])

    def test_left_padded_prompt(self):
        # Exact token-ids equality across different batch shapes is tie-flaky
        # with a random tiny model, so check equivalence at the LOGITS level:
        # teacher-force the padded generation through both the padded and the
        # unpadded prompt and require matching next-token distributions.
        pad = 61
        ids = np.array([[pad, pad, 3, 5], [1, 2, 3, 4]], np.int32)
        mask = np.array([[0, 0, 1, 1], [1, 1, 1, 1]], np.int32)
        toks, _ = ENGINE.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=4)

        gen = toks[0:1]
        full_pad = np.concatenate([ids[0:1], gen], axis=1)
        mask_pad = np.concatenate([mask[0:1], np.ones_like(gen)], axis=1)
        full_unp = np.concatenate([np.array([[3, 5]], np.int32), gen], axis=1)
        mask_unp = np.ones_like(full_unp)
        lp, _ = decoder_forward(PARAMS["decoder"], CFG.decoder,
                                input_ids=jnp.asarray(full_pad),
                                attention_mask=jnp.asarray(mask_pad))
        lu, _ = decoder_forward(PARAMS["decoder"], CFG.decoder,
                                input_ids=jnp.asarray(full_unp),
                                attention_mask=jnp.asarray(mask_unp))
        np.testing.assert_allclose(np.asarray(lp[0, 2:]), np.asarray(lu[0]),
                                   atol=1e-4, rtol=1e-4)
        # and the engine's own tokens must be reproducible for the padded batch
        toks2, _ = ENGINE.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=4)
        np.testing.assert_array_equal(toks, toks2)

    def test_determinism_same_rng(self):
        ids = np.array([[3, 5, 9, 11]], np.int32)
        mask = np.ones_like(ids)
        s = SamplingConfig(temperature=0.8, top_k=10, top_p=0.9)
        t1, _ = ENGINE.generate(PARAMS, ids, mask, sampling=s, max_new_tokens=6,
                                rng=jax.random.PRNGKey(42))
        t2, _ = ENGINE.generate(PARAMS, ids, mask, sampling=s, max_new_tokens=6,
                                rng=jax.random.PRNGKey(42))
        np.testing.assert_array_equal(t1, t2)

    def test_dna_conditioning_changes_output(self):
        b_ids = np.full((1, 8), 5, np.int32)
        b_ids[0, 1:4] = CFG.dna_pad_token_id
        mask = np.ones_like(b_ids)
        dna_ids = np.array([[3, 6, 7]], np.int32)
        dna_mask = np.ones_like(dna_ids)
        t_dna, _ = ENGINE.generate(PARAMS, b_ids, mask, dna_ids, dna_mask,
                                   greedy=True, max_new_tokens=4)
        dna_ids2 = np.array([[3, 100, 200]], np.int32)
        t_dna2, _ = ENGINE.generate(PARAMS, b_ids, mask, dna_ids2, dna_mask,
                                    greedy=True, max_new_tokens=4)
        assert not np.array_equal(t_dna, t_dna2)


class TestSampling:
    def test_greedy_is_argmax(self):
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(3, 50)).astype(np.float32))
        out = sample_logits(jax.random.PRNGKey(0), logits, greedy=True)
        np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))

    def test_top_k_restricts_support(self):
        logits = jnp.asarray(np.linspace(0, 10, 50, dtype=np.float32)[None, :])
        draws = [int(sample_logits(jax.random.PRNGKey(i), logits, temperature=1.0,
                                   top_k=5)[0]) for i in range(20)]
        assert all(d >= 45 for d in draws)

    def test_top_p_keeps_at_least_one(self):
        logits = jnp.asarray(np.array([[10.0] + [0.0] * 9], np.float32))
        out = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0,
                            top_k=10, top_p=0.01)
        assert int(out[0]) == 0

    def test_completion_mask(self):
        toks = jnp.asarray(np.array([[4, EOS, 9, 9], [1, 2, 3, 4]], np.int32))
        mask = completion_mask_from_eos(toks, EOS)
        np.testing.assert_array_equal(np.asarray(mask),
                                      [[1, 1, 0, 0], [1, 1, 1, 1]])


class TestGroupedGeneration:
    def test_group_size_shapes_and_grouping(self):
        ids = np.array([[3, 5, 9, 11], [1, 2, 3, 4]], np.int32)
        mask = np.ones_like(ids)
        toks, cmask = ENGINE.generate(PARAMS, ids, mask, greedy=True,
                                      max_new_tokens=5, group_size=3)
        assert toks.shape == (6, 5) and cmask.shape == (6, 5)
        # greedy: all G copies of a group must be identical, and equal to the
        # ungrouped generation for that prompt
        single, _ = ENGINE.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=5)
        for g in range(3):
            np.testing.assert_array_equal(toks[g], single[0])
            np.testing.assert_array_equal(toks[3 + g], single[1])

    def test_group_sampling_varies_within_group(self):
        ids = np.array([[3, 5, 9, 11]], np.int32)
        mask = np.ones_like(ids)
        s = SamplingConfig(temperature=1.5, top_k=50, top_p=1.0)
        toks, _ = ENGINE.generate(PARAMS, ids, mask, sampling=s,
                                  max_new_tokens=6, group_size=4,
                                  rng=jax.random.PRNGKey(5))
        rows = {tuple(r) for r in toks.tolist()}
        assert len(rows) > 1, "all group samples identical"


class TestShardedGeneration:
    def test_generate_under_tp_mesh(self):
        from bioreason_tpu.config import MeshConfig
        from bioreason_tpu.parallel import make_mesh
        from bioreason_tpu.parallel.partition import partition_rules_fusion, shardings_for_params
        import jax as _jax

        mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
        sharded = _jax.device_put(
            PARAMS, shardings_for_params(PARAMS, partition_rules_fusion(), mesh))
        ids = np.array([[3, 5, 9, 11], [1, 2, 3, 4]], np.int32)
        mask = np.ones_like(ids)
        toks, _ = ENGINE.generate(sharded, ids, mask, greedy=True, max_new_tokens=4)
        ref, _ = ENGINE.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=4)
        np.testing.assert_array_equal(toks, ref)


class TestInt8Serving:
    def test_greedy_int8_matches_oracle(self):
        """Quantized base weights flow through the whole engine (prefill +
        decode loop): greedy output equals the no-cache oracle running the
        SAME int8 params (dense() dequantizes in both paths)."""
        from bioreason_tpu.train.quant import quantize_frozen_int8
        qparams = quantize_frozen_int8(PARAMS)
        ids = np.array([[3, 5, 9, 11], [1, 2, 3, 4]], np.int32)
        mask = np.ones_like(ids)
        toks, _ = ENGINE.generate(qparams, ids, mask, greedy=True,
                                  max_new_tokens=5)
        oracle = _greedy_oracle(qparams, CFG, ids, mask, 5)
        for b in range(2):
            row = toks[b]
            n = np.argmax(row == EOS) + 1 if (row == EOS).any() else len(row)
            np.testing.assert_array_equal(row[:n], oracle[b, :n])
