import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.models.qwen3 import cross_entropy_loss
from bioreason_tpu.ops.fused_ce import decoder_lm_loss, fused_softmax_xent


def dense_loss(hidden, emb, labels):
    logits = jnp.einsum("bth,vh->btv", hidden, emb).astype(jnp.float32)
    return cross_entropy_loss(logits, labels)


@pytest.mark.parametrize("chunk", [7, 32, 4096])
def test_matches_dense(chunk):
    rng = np.random.default_rng(0)
    B, T, H, V = 2, 10, 16, 50
    hidden = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))
    labels = labels.at[:, :3].set(-100)
    l_fused = decoder_lm_loss(hidden, emb, labels, chunk=chunk)
    l_dense = dense_loss(hidden, emb, labels)
    np.testing.assert_allclose(float(l_fused), float(l_dense), rtol=1e-5)


def test_gradients_match_dense():
    rng = np.random.default_rng(1)
    B, T, H, V = 2, 8, 12, 37
    hidden = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))
    labels = labels.at[0, :2].set(-100)

    gf = jax.grad(lambda h, e: decoder_lm_loss(h, e, labels, chunk=16,
                                               need_embedding_grad=True),
                  argnums=(0, 1))(hidden, emb)
    gd = jax.grad(lambda h, e: dense_loss(h, e, labels), argnums=(0, 1))(hidden, emb)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_all_ignored_is_zero_loss():
    hidden = jnp.ones((1, 4, 8))
    emb = jnp.ones((10, 8))
    labels = jnp.full((1, 4), -100)
    assert float(decoder_lm_loss(hidden, emb, labels, chunk=4)) == 0.0


def test_chunked_token_logps_matches_dense():
    from bioreason_tpu.ops.fused_ce import chunked_token_logps
    rng = np.random.default_rng(2)
    N, H, V = 12, 16, 41
    h = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    def dense(h, emb):
        logits = (h @ emb.T).astype(jnp.float32)
        return jnp.take_along_axis(jax.nn.log_softmax(logits, -1), t[:, None], 1)[:, 0]

    lp_c = chunked_token_logps(h, emb, t, 16)
    lp_d = dense(h, emb)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_d), rtol=1e-5, atol=1e-6)

    # gradients (weighted sum to exercise per-token cotangents)
    w = jnp.asarray(rng.normal(size=N).astype(np.float32))
    gc = jax.grad(lambda h: (chunked_token_logps(h, emb, t, 8) * w).sum())(h)
    gd = jax.grad(lambda h: (dense(h, emb) * w).sum())(h)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-5, rtol=1e-4)


class TestGatheredLoss:
    def test_gathered_equals_full(self):
        """decoder_lm_loss_gathered == decoder_lm_loss (same shifted-CE mean)
        while running the head on supervised positions only."""
        import jax, jax.numpy as jnp, numpy as np
        from bioreason_tpu.ops.fused_ce import (decoder_lm_loss,
                                                decoder_lm_loss_gathered,
                                                gather_label_positions)
        rng = np.random.default_rng(0)
        B, T, H, V = 3, 40, 16, 97
        hidden = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        emb = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
        labels = rng.integers(0, V, (B, T)).astype(np.int32)
        labels[:, :25] = -100
        labels[1, 30:] = -100
        full = decoder_lm_loss(hidden, emb, jnp.asarray(labels), chunk=32)
        pos, tgt, val = gather_label_positions(labels, bucket=8)
        assert pos.shape[1] <= 16
        got = decoder_lm_loss_gathered(hidden, emb, jnp.asarray(pos),
                                       jnp.asarray(tgt), jnp.asarray(val),
                                       chunk=32)
        np.testing.assert_allclose(float(got), float(full), rtol=1e-6)

    def test_gathered_grads_match_full(self):
        import jax, jax.numpy as jnp, numpy as np
        from bioreason_tpu.ops.fused_ce import (decoder_lm_loss,
                                                decoder_lm_loss_gathered,
                                                gather_label_positions)
        rng = np.random.default_rng(1)
        B, T, H, V = 2, 24, 8, 33
        hidden = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        emb = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
        labels = rng.integers(0, V, (B, T)).astype(np.int32)
        labels[:, :12] = -100
        pos, tgt, val = gather_label_positions(labels, bucket=4)
        g_full = jax.grad(lambda h: decoder_lm_loss(h, emb, jnp.asarray(labels),
                                                    chunk=16))(hidden)
        g_gath = jax.grad(lambda h: decoder_lm_loss_gathered(
            h, emb, jnp.asarray(pos), jnp.asarray(tgt), jnp.asarray(val),
            chunk=16))(hidden)
        np.testing.assert_allclose(np.asarray(g_gath), np.asarray(g_full),
                                   atol=1e-6)


class TestSaveLogits:
    """save_logits=True: backward reuses stored bf16 max-shifted chunk logits
    (ops/fused_ce.py) — gradients must match the recompute path to bf16
    storage tolerance, and exactly where probs are large."""

    def _setup(self, seed=3, B=2, T=9, H=16, V=41):
        rng = np.random.default_rng(seed)
        hidden = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
        emb = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))
        labels = labels.at[:, :2].set(-100)
        return hidden, emb, labels

    def test_loss_identical(self):
        hidden, emb, labels = self._setup()
        l0 = decoder_lm_loss(hidden, emb, labels, chunk=16)
        l1 = decoder_lm_loss(hidden, emb, labels, chunk=16, save_logits=True)
        # the forward lse/gold math is unchanged — losses are bit-identical
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    @pytest.mark.parametrize("chunk", [7, 16, 64])
    def test_gradients_match_recompute(self, chunk):
        hidden, emb, labels = self._setup()

        def loss(h, e, save):
            return decoder_lm_loss(h, e, labels, chunk=chunk,
                                   need_embedding_grad=True, save_logits=save)

        g0 = jax.grad(lambda h, e: loss(h, e, False), argnums=(0, 1))(hidden, emb)
        g1 = jax.grad(lambda h, e: loss(h, e, True), argnums=(0, 1))(hidden, emb)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)

    def test_gradients_match_dense_oracle(self):
        hidden, emb, labels = self._setup(seed=5)
        gf = jax.grad(lambda h, e: decoder_lm_loss(h, e, labels, chunk=16,
                                                   need_embedding_grad=True,
                                                   save_logits=True),
                      argnums=(0, 1))(hidden, emb)
        gd = jax.grad(lambda h, e: dense_loss(h, e, labels),
                      argnums=(0, 1))(hidden, emb)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)

    def test_frozen_head_path(self):
        hidden, emb, labels = self._setup(seed=7)
        g0 = jax.grad(lambda h: decoder_lm_loss(h, emb, labels, chunk=16))(hidden)
        g1 = jax.grad(lambda h: decoder_lm_loss(h, emb, labels, chunk=16,
                                                save_logits=True))(hidden)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   atol=5e-4, rtol=5e-3)

    def test_fusion_forward_flag(self):
        # the FusionConfig.ce_save_logits knob reaches the loss and trains
        from bioreason_tpu.config import FusionConfig
        import dataclasses
        from bioreason_tpu.models import init_fusion
        from bioreason_tpu.models.fusion import fusion_forward
        cfg = dataclasses.replace(FusionConfig.tiny(), ce_save_logits=True)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        B, T, D = 2, 12, 8
        ids = jnp.full((B, T), 5, jnp.int32)
        mask = jnp.ones((B, T), jnp.int32)
        dna = jnp.ones((B, D), jnp.int32)
        dmask = jnp.zeros((B, D), jnp.int32)   # no DNA tokens -> no pads
        labels = jnp.full((B, T), 7, jnp.int32)
        def lf(p):
            _, loss = fusion_forward(p, cfg, ids, mask, dna, dmask, labels=labels)
            return loss
        loss, grads = jax.value_and_grad(lf)(params)
        assert np.isfinite(float(loss))
        gnorm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
        assert gnorm > 0


class TestFocalLoss:
    """Detached focal weighting (ops/fused_ce.py:_focal_weighted_mean)."""

    def _setup(self):
        rng = np.random.default_rng(0)
        b, t, h, v = 2, 16, 8, 32
        hidden = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
        emb = jnp.asarray(rng.normal(size=(v, h)), jnp.float32)
        labels = np.asarray(rng.integers(0, v, (b, t)), np.int32)
        labels[:, :5] = -100
        return hidden, emb, jnp.asarray(labels)

    def test_gamma_zero_equals_mean_ce(self):
        from bioreason_tpu.ops.fused_ce import decoder_lm_loss, decoder_lm_loss_focal
        hidden, emb, labels = self._setup()
        plain = float(decoder_lm_loss(hidden, emb, labels))
        focal = float(decoder_lm_loss_focal(hidden, emb, labels, 0.0))
        assert abs(plain - focal) < 1e-5

    def test_gathered_matches_dense(self):
        from bioreason_tpu.ops.fused_ce import (decoder_lm_loss_focal,
                                                decoder_lm_loss_focal_gathered,
                                                gather_label_positions)
        hidden, emb, labels = self._setup()
        pos, tgt, val = gather_label_positions(np.asarray(labels))
        for gamma in (0.0, 2.0):
            dense = float(decoder_lm_loss_focal(hidden, emb, labels, gamma))
            gath = float(decoder_lm_loss_focal_gathered(
                hidden, emb, jnp.asarray(pos), jnp.asarray(tgt),
                jnp.asarray(val), gamma))
            assert abs(dense - gath) < 1e-4, (gamma, dense, gath)

    def test_downweights_fit_tokens(self):
        """A token the model already predicts (p ~ 1) must carry ~zero
        gradient under gamma > 0, while unfit tokens keep theirs."""
        from bioreason_tpu.ops.fused_ce import decoder_lm_loss_focal
        v, h = 8, 8
        emb = jnp.eye(v, h, dtype=jnp.float32) * 10.0
        labels = jnp.asarray([[0, 1, 2]], jnp.int32)  # predicts 1 then 2
        # hidden[0] aligned with emb[1] -> token 1 fit; hidden[1] orthogonal
        hidden = jnp.asarray([[[0, 10, 0, 0, 0, 0, 0, 0],
                               [0, 0, 0, 0, 0, 0, 0, 1e-3],
                               [0, 0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
        g = jax.grad(lambda hh: decoder_lm_loss_focal(hh, emb, labels, 2.0))(hidden)
        g0 = float(jnp.abs(g[0, 0]).sum())   # predicts fit token 1
        g1 = float(jnp.abs(g[0, 1]).sum())   # predicts unfit token 2
        assert g1 > 10 * max(g0, 1e-12), (g0, g1)

    def test_embedding_grad_flows(self):
        from bioreason_tpu.ops.fused_ce import decoder_lm_loss_focal
        hidden, emb, labels = self._setup()
        g = jax.grad(lambda e: decoder_lm_loss_focal(
            hidden, e, labels, 2.0, need_embedding_grad=True))(emb)
        assert float(jnp.abs(g).sum()) > 0.0
