import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.config import DecoderConfig, EncoderConfig, FusionConfig
from bioreason_tpu.models import (
    init_decoder, decoder_forward, init_cache, cross_entropy_loss,
    init_encoder, encoder_forward,
    init_fusion, fusion_forward, splice_embeddings, validate_splice,
    init_classifier, classifier_forward,
)

RNG = jax.random.PRNGKey(0)


class TestDecoder:
    def setup_method(self):
        self.cfg = DecoderConfig.tiny()
        self.params = init_decoder(RNG, self.cfg)

    def test_shapes(self):
        ids = jnp.arange(12).reshape(2, 6) % self.cfg.vocab_size
        logits, _ = decoder_forward(self.params, self.cfg, input_ids=ids)
        assert logits.shape == (2, 6, self.cfg.vocab_size)
        assert logits.dtype == jnp.float32

    def test_causality(self):
        ids = jnp.ones((1, 8), jnp.int32) * 5
        logits1, _ = decoder_forward(self.params, self.cfg, input_ids=ids)
        ids2 = ids.at[0, 6].set(9)  # change a late token
        logits2, _ = decoder_forward(self.params, self.cfg, input_ids=ids2)
        np.testing.assert_allclose(np.asarray(logits1[0, :6]), np.asarray(logits2[0, :6]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(logits1[0, 6:]), np.asarray(logits2[0, 6:]))

    def test_left_padding_equivalence(self):
        content = jnp.array([[3, 7, 11, 2]], jnp.int32)
        mask_c = jnp.ones((1, 4), jnp.int32)
        logits_plain, _ = decoder_forward(self.params, self.cfg, input_ids=content,
                                          attention_mask=mask_c)
        padded = jnp.concatenate([jnp.zeros((1, 3), jnp.int32), content], axis=1)
        mask_p = jnp.concatenate([jnp.zeros((1, 3), jnp.int32), mask_c], axis=1)
        logits_pad, _ = decoder_forward(self.params, self.cfg, input_ids=padded,
                                        attention_mask=mask_p)
        np.testing.assert_allclose(np.asarray(logits_plain[0]), np.asarray(logits_pad[0, 3:]),
                                   rtol=2e-2, atol=2e-2)

    def test_kv_cache_matches_full_forward(self):
        b, prompt_len, total = 2, 5, 9
        ids = jax.random.randint(jax.random.PRNGKey(1), (b, total), 0, self.cfg.vocab_size)
        mask = jnp.ones((b, total), jnp.int32)
        full_logits, _ = decoder_forward(self.params, self.cfg, input_ids=ids,
                                         attention_mask=mask)

        cache = init_cache(self.cfg, b, total, dtype=jnp.float32)
        cache_mask = jnp.zeros((b, total), jnp.int32).at[:, :prompt_len].set(1)
        positions = jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len))
        logits_p, cache = decoder_forward(
            self.params, self.cfg, input_ids=ids[:, :prompt_len],
            attention_mask=jnp.ones((b, prompt_len), jnp.int32),
            positions=positions, cache=cache, cache_index=0, cache_mask=cache_mask)
        np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full_logits[:, :prompt_len]),
                                   rtol=2e-2, atol=2e-2)

        for t in range(prompt_len, total):
            cache_mask = jnp.zeros((b, total), jnp.int32).at[:, :t + 1].set(1)
            pos = jnp.full((b, 1), t, jnp.int32)
            step_logits, cache = decoder_forward(
                self.params, self.cfg, input_ids=ids[:, t:t + 1],
                attention_mask=jnp.ones((b, 1), jnp.int32),
                positions=pos, cache=cache, cache_index=t, cache_mask=cache_mask)
            np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                       np.asarray(full_logits[:, t]),
                                       rtol=2e-2, atol=2e-2)

    def test_cross_entropy_ignores_minus_100(self):
        logits = jnp.zeros((1, 4, 10))
        labels = jnp.array([[-100, 2, -100, 3]])
        loss = cross_entropy_loss(logits, labels)
        # uniform logits -> log(10) per supervised target (positions 1,3 via shift)
        np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)

    def test_inputs_embeds_path(self):
        ids = jnp.arange(6).reshape(1, 6)
        embeds = jnp.take(self.params["embed"]["embedding"], ids, axis=0)
        l1, _ = decoder_forward(self.params, self.cfg, input_ids=ids)
        l2, _ = decoder_forward(self.params, self.cfg, inputs_embeds=embeds)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)


class TestEncoder:
    def test_shapes_and_mask(self):
        cfg = EncoderConfig.tiny()
        params = init_encoder(RNG, cfg)
        ids = jax.random.randint(RNG, (2, 10), 0, cfg.vocab_size)
        mask = jnp.ones((2, 10), jnp.int32).at[1, 7:].set(0)
        h = encoder_forward(params, cfg, ids, mask)
        assert h.shape == (2, 10, cfg.hidden_size)
        # padded keys must not influence valid positions
        ids2 = ids.at[1, 8].set((ids[1, 8] + 1) % cfg.vocab_size)
        h2 = encoder_forward(params, cfg, ids2, mask)
        np.testing.assert_allclose(np.asarray(h[1, :7]), np.asarray(h2[1, :7]),
                                   rtol=1e-5, atol=1e-5)


class TestSplice:
    def _reference_splice(self, text_embeds, input_ids, dna_embeds, dna_mask, pad_tok):
        """Torch-semantics oracle: boolean masked assignment, row-major."""
        out = np.array(text_embeds, copy=True)
        flat = []
        for s in range(dna_embeds.shape[0]):
            for l in range(dna_embeds.shape[1]):
                if dna_mask[s, l]:
                    flat.append(np.asarray(dna_embeds[s, l]))
        flat = np.stack(flat) if flat else np.zeros((0, text_embeds.shape[-1]))
        idx = 0
        for b in range(input_ids.shape[0]):
            for t in range(input_ids.shape[1]):
                if input_ids[b, t] == pad_tok:
                    out[b, t] = flat[idx]
                    idx += 1
        return out

    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(0)
        B, T, H, S, Ld = 2, 12, 8, 3, 5
        pad_tok = 99
        text = rng.normal(size=(B, T, H)).astype(np.float32)
        dna = rng.normal(size=(S, Ld, H)).astype(np.float32)
        # right-padded dna masks: 4, 3, 2 valid
        dna_mask = np.zeros((S, Ld), np.int32)
        for s, n in enumerate([4, 3, 2]):
            dna_mask[s, :n] = 1
        ids = np.full((B, T), 7, np.int32)
        # item 0 gets first 2 sequences (4+3=7 tokens), item 1 gets last (2)
        ids[0, 2:9] = pad_tok
        ids[1, 5:7] = pad_tok
        out = splice_embeddings(jnp.asarray(text), jnp.asarray(ids), jnp.asarray(dna),
                                jnp.asarray(dna_mask), pad_tok)
        expected = self._reference_splice(text, ids, dna, dna_mask, pad_tok)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_left_padded_dna(self):
        # Evo2 tokenizer pads left; ordering must still be per-seq positional
        rng = np.random.default_rng(1)
        B, T, H, S, Ld = 1, 8, 4, 2, 4
        pad_tok = 50
        text = rng.normal(size=(B, T, H)).astype(np.float32)
        dna = rng.normal(size=(S, Ld, H)).astype(np.float32)
        dna_mask = np.array([[0, 0, 1, 1], [0, 1, 1, 1]], np.int32)
        ids = np.full((B, T), 2, np.int32)
        ids[0, 1:6] = pad_tok
        out = splice_embeddings(jnp.asarray(text), jnp.asarray(ids), jnp.asarray(dna),
                                jnp.asarray(dna_mask), pad_tok)
        expected = self._reference_splice(text, ids, dna, dna_mask, pad_tok)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_per_item_splice_matches_global(self):
        from bioreason_tpu.models.fusion import splice_embeddings_per_item
        rng = np.random.default_rng(3)
        B, T, H, k, Ld = 2, 10, 6, 2, 4
        pad_tok = 77
        text = rng.normal(size=(B, T, H)).astype(np.float32)
        dna = rng.normal(size=(B * k, Ld, H)).astype(np.float32)
        dna_mask = np.zeros((B * k, Ld), np.int32)
        for s_, n in enumerate([3, 2, 4, 1]):
            dna_mask[s_, :n] = 1
        ids = np.full((B, T), 5, np.int32)
        ids[0, 1:6] = pad_tok     # 3+2 tokens for item 0
        ids[1, 2:7] = pad_tok     # 4+1 tokens for item 1
        a = splice_embeddings(jnp.asarray(text), jnp.asarray(ids), jnp.asarray(dna),
                              jnp.asarray(dna_mask), pad_tok)
        b = splice_embeddings_per_item(jnp.asarray(text), jnp.asarray(ids),
                                       jnp.asarray(dna), jnp.asarray(dna_mask),
                                       pad_tok, per_item=k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_validate_splice_raises_on_mismatch(self):
        ids = np.array([[260, 260, 1]])
        dna_ids = np.array([[3, 6, 1]])  # 2 non-pad
        validate_splice(ids, dna_ids, 260)  # 2 == 2 ok
        with pytest.raises(ValueError, match="do not match"):
            validate_splice(np.array([[260, 1, 1]]), dna_ids, 260)


class TestFusion:
    def test_forward_and_frozen_encoder_grads(self):
        cfg = FusionConfig.tiny()
        params = init_fusion(RNG, cfg)
        B, T, S, Ld = 2, 10, 4, 6
        ids = np.full((B, T), 5, np.int32)
        dna_mask = np.zeros((S, Ld), np.int32)
        for s, n in enumerate([3, 2, 2, 3]):
            dna_mask[s, :n] = 1
        dna_ids = np.where(dna_mask, 7, 1).astype(np.int32)
        ids[0, 0:5] = cfg.dna_pad_token_id
        ids[1, 2:7] = cfg.dna_pad_token_id
        mask = np.ones((B, T), np.int32)
        labels = np.where(np.arange(T)[None] >= 7, ids, -100)

        def loss_fn(p):
            _, loss = fusion_forward(p, cfg, jnp.asarray(ids), jnp.asarray(mask),
                                     jnp.asarray(dna_ids), jnp.asarray(dna_mask),
                                     labels=jnp.asarray(labels))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        # frozen encoder -> zero grads there; projection gets grads
        enc_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["encoder"]))
        proj_norm = float(jnp.abs(grads["dna_projection"]["kernel"]).sum())
        assert enc_norm == 0.0
        assert proj_norm > 0.0


class TestClassifier:
    def test_forward(self):
        cfg = EncoderConfig.tiny()
        params = init_classifier(RNG, cfg, num_classes=3)
        ids = jax.random.randint(RNG, (2, 12), 0, cfg.vocab_size)
        mask = jnp.ones((2, 12), jnp.int32)
        logits = classifier_forward(params, cfg, ids, ids, mask, mask)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()
