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

    def test_full_int8_including_embed(self):
        """Serving configuration: EVERY decoder weight int8 (kernels +
        embedding + tied logits head). Greedy engine output matches the
        no-cache oracle on the same quantized tree, and the int8 embedding
        gather/logits agree with explicit dequantization."""
        import jax.numpy as jnp
        from bioreason_tpu.models import layers as L
        from bioreason_tpu.train.quant import quantize_frozen_int8
        qparams = quantize_frozen_int8(PARAMS, include_embed=True)
        e = qparams["decoder"]["embed"]["embedding"]
        assert isinstance(e, dict) and e["q"].dtype == jnp.int8
        # embed() and lm_logits() vs explicit dequantized reference
        deq = np.asarray(e["q"], np.float32) * np.asarray(e["scale"], np.float32)
        ids = np.array([[3, 5, 9]], np.int32)
        got = np.asarray(L.embed(qparams["decoder"]["embed"], jnp.asarray(ids),
                                 jnp.float32))
        np.testing.assert_allclose(got, deq[ids[0]][None], rtol=1e-6)
        h = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 2, deq.shape[1])), jnp.float32)
        lg = np.asarray(L.lm_logits(qparams["decoder"], h))
        ref = np.asarray(h, np.float32) @ deq.T
        np.testing.assert_allclose(lg, ref, atol=1e-3, rtol=1e-3)
        # whole engine runs on the quantized tree
        mask = np.ones_like(ids)
        toks, _ = ENGINE.generate(qparams, ids, mask, greedy=True,
                                  max_new_tokens=4)
        oracle = _greedy_oracle(qparams, CFG, ids, mask, 4)
        row, orow = toks[0], oracle[0]
        n = np.argmax(row == EOS) + 1 if (row == EOS).any() else len(row)
        np.testing.assert_array_equal(row[:n], orow[:n])

    def test_device_side_quantization_matches_host(self):
        import jax
        import jax.numpy as jnp
        from bioreason_tpu.train.quant import quantize_frozen_int8
        host = quantize_frozen_int8(PARAMS, include_embed=True)
        dev = jax.jit(lambda p: quantize_frozen_int8(p, include_embed=True,
                                                     xp=jnp))(PARAMS)
        ah = jax.tree.leaves(host)
        ad = jax.tree.leaves(dev)
        assert len(ah) == len(ad)
        for x, y in zip(ah, ad):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       atol=1e-5, rtol=1e-5)


class TestKVCacheInt8:
    def test_decode_logits_close_to_bf16_cache(self):
        """Prefill + one decode step with int8 KV vs float KV: logits agree
        within quantization tolerance (per-token-head absmax, ~0.4% RMS)."""
        import jax.numpy as jnp
        from bioreason_tpu.models.qwen3 import decoder_forward, init_cache
        ids = np.array([[3, 5, 9, 11, 2, 7]], np.int32)
        mask = np.ones_like(ids)
        outs = {}
        for name, quant in [("f32", False), ("int8", True)]:
            cache = init_cache(CFG.decoder, 1, 8, jnp.float32, quantize=quant)
            cmask = np.pad(mask, ((0, 0), (0, 2)))
            logits, cache = decoder_forward(
                PARAMS["decoder"], CFG.decoder, input_ids=jnp.asarray(ids),
                attention_mask=jnp.asarray(mask),
                positions=jnp.arange(6)[None],
                cache=cache, cache_index=0, cache_mask=jnp.asarray(cmask))
            # one decode step
            cmask[0, 6] = 1
            step, _ = decoder_forward(
                PARAMS["decoder"], CFG.decoder,
                input_ids=jnp.asarray([[4]], np.int32),
                attention_mask=jnp.ones((1, 1), jnp.int32),
                positions=jnp.asarray([[6]]),
                cache=cache, cache_index=6, cache_mask=jnp.asarray(cmask))
            outs[name] = (np.asarray(logits[:, -1]), np.asarray(step[:, 0]))
        for a, b in zip(outs["f32"], outs["int8"]):
            np.testing.assert_allclose(a, b, atol=0.08, rtol=0.05)

    def test_engine_kv_int8_deterministic_and_valid(self):
        eng = GenerationEngine(CFG, eos_token_id=EOS, kv_int8=True)
        ids = np.array([[3, 5, 9, 11], [1, 2, 3, 4]], np.int32)
        mask = np.ones_like(ids)
        t1, m1 = eng.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=5)
        t2, _ = eng.generate(PARAMS, ids, mask, greedy=True, max_new_tokens=5)
        np.testing.assert_array_equal(t1, t2)
        assert t1.shape == (2, 5) and m1.sum() > 0
        # grouped mode with quantized prompt + decode caches
        tg, mg = eng.generate(PARAMS, ids, mask, greedy=True,
                              max_new_tokens=5, group_size=2)
        assert tg.shape == (4, 5)
        # greedy grouped completions replicate within each group
        np.testing.assert_array_equal(tg[0], tg[1])
        np.testing.assert_array_equal(tg[2], tg[3])

    def test_continuous_batcher_kv_int8(self):
        from bioreason_tpu.generate.continuous import ContinuousBatcher, Request
        from bioreason_tpu.config import SamplingConfig
        cb = ContinuousBatcher(PARAMS, CFG, eos_token_id=EOS, capacity=2,
                               max_len=64, kv_int8=True, prompt_bucket=16,
                               sampling=SamplingConfig(max_new_tokens=6))
        reqs = [Request(i, np.array([[3, 5, 9, 11 + i]], np.int32),
                        np.ones((1, 4), np.int32), max_new_tokens=6,
                        greedy=True) for i in range(3)]
        done = cb.run(reqs)
        assert len(done) == 3 and all(len(r.tokens) >= 1 for r in done)
        # int8 pool: same request twice -> same greedy tokens
        cb2 = ContinuousBatcher(PARAMS, CFG, eos_token_id=EOS, capacity=2,
                                max_len=64, kv_int8=True, prompt_bucket=16,
                                sampling=SamplingConfig(max_new_tokens=6))
        again = cb2.run([Request(9, np.array([[3, 5, 9, 11]], np.int32),
                                 np.ones((1, 4), np.int32), max_new_tokens=6,
                                 greedy=True)])
        first = next(r for r in done if r.rid == 0)
        assert again[0].tokens == first.tokens


class TestTeacherForcedEngineParity:
    def test_prefill_decode_matches_training_forward(self):
        """VERDICT r4 #1(d): the generation path (prompt-only left-padded
        prefill + KV-cached decode, exactly the engine's non-grouped layout)
        reproduces the TRAINING forward (sft_collate layout through
        fusion_forward) teacher-forced on the gold completion — logits agree
        position-for-position. Rules the engine/KV-cache/positions/splice out
        of the rehearsal quality failure (artifacts/rehearsal_bench.json)."""
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.chat_template import render_chat
        from bioreason_tpu.data.collate import IGNORE_INDEX, sft_collate
        from bioreason_tpu.data.kegg import (format_kegg_for_dna_llm,
                                             synthetic_kegg_items)
        from bioreason_tpu.models.fusion import (fused_input_embeddings,
                                                 fusion_forward)
        from bioreason_tpu.models import layers as L
        from bioreason_tpu.models.qwen3 import decoder_forward, init_cache

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer(kmer=1))
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(1), cfg)
        examples = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(
            2, seq_len=16, seed=4, learnable=True, fixed_positions=True)]

        # -- training side: collated full-sequence forward --------------------
        batch = sft_collate(examples, proc, max_length_text=512,
                            max_length_dna=32, supervise_eos=True)
        logits_train, _ = fusion_forward(
            params, cfg, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["dna_input_ids"]),
            jnp.asarray(batch["dna_attention_mask"]))
        logits_train = np.asarray(logits_train)

        # -- eval side: prompt-only left-padded prefill + forced decode -------
        prompt_msgs = [[m for m in ex["prompt"] if m["role"] != "assistant"]
                       for ex in examples]
        rendered = [render_chat(m, add_generation_prompt=True) for m in prompt_msgs]
        out = proc(text=rendered,
                   batch_dna_sequences=[ex["dna_sequences"] for ex in examples],
                   max_length_text=512, max_length_dna=32, padding_side="left")
        b, p = out.input_ids.shape
        n_forced = 8
        dtype = jnp.dtype(cfg.decoder.dtype)
        embeds = fused_input_embeddings(params, cfg, jnp.asarray(out.input_ids),
                                        jnp.asarray(out.dna_input_ids),
                                        jnp.asarray(out.dna_attention_mask))
        cache = init_cache(cfg.decoder, b, p + n_forced, dtype)
        am = jnp.asarray(out.attention_mask)
        cache_mask = jnp.pad(am, ((0, 0), (0, n_forced)))
        positions = L.positions_from_mask(am)
        logits, cache = decoder_forward(
            params["decoder"], cfg.decoder, inputs_embeds=embeds,
            attention_mask=am, positions=positions, cache=cache,
            cache_index=0, cache_mask=cache_mask)
        step_logits = [np.asarray(logits[:, -1, :])]       # predicts gold[0]

        # gold completion tokens per row from the supervised span
        labels = np.asarray(batch["labels"])
        spans = []
        for i in range(b):
            idx = np.nonzero(labels[i] != IGNORE_INDEX)[0]
            spans.append((int(idx[0]), np.asarray(batch["input_ids"])[i, idx]))
        gold = np.stack([s[1][:n_forced] for s in spans])   # [B, n_forced]
        prompt_lens = np.asarray(am.sum(axis=-1), np.int32)

        kv_mask = cache_mask
        for j in range(1, n_forced):
            cur = jnp.asarray(gold[:, j - 1][:, None])
            pos_j = jnp.asarray(prompt_lens + j - 1)[:, None]
            kv_mask = kv_mask.at[:, p + j - 1].set(1)
            lj, cache = decoder_forward(
                params["decoder"], cfg.decoder, input_ids=cur,
                attention_mask=jnp.ones((b, 1), jnp.int32), positions=pos_j,
                cache=cache, cache_index=p + j - 1, cache_mask=kv_mask)
            step_logits.append(np.asarray(lj[:, 0, :]))

        # -- compare: engine step j logits == training logits predicting ------
        # gold[j] (training position span_start + j - 1)
        for i in range(b):
            start = spans[i][0]
            for j in range(n_forced):
                train_row = logits_train[i, start + j - 1]
                eval_row = step_logits[j][i]
                np.testing.assert_allclose(eval_row, train_row, rtol=2e-4,
                                           atol=2e-4)
                assert np.argmax(eval_row) == np.argmax(train_row)
