"""Sequence parallelism for the long-DNA encoder (parallel/sp.py).

The reference handles long DNA by truncation only (dataset/utils.py:6-20);
SP is the TPU-native extension: DNA token axis sharded over the mesh 'model'
axis, shard_map attention with all-gathered K/V. Numerics must match the
unsharded path exactly (same kernel, same fp32 softmax)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.config import EncoderConfig, FusionConfig, MeshConfig
from bioreason_tpu.models.attention import xla_attention
from bioreason_tpu.parallel import make_mesh
from bioreason_tpu.parallel.sp import (disable_sequence_sharding,
                                       enable_sequence_sharding, sp_attention,
                                       shard_sequence)


@pytest.fixture()
def sp_mesh():
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    enable_sequence_sharding(mesh, "model")
    yield mesh
    disable_sequence_sharding()


class TestSPAttention:
    def test_matches_unsharded(self, sp_mesh):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, (2, 16)), jnp.int32).at[:, 0].set(1)
        out_sp = sp_attention(q, k, v, kv_mask=mask)
        out_ref = xla_attention(q, k, v, kv_mask=mask, causal=False)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_works_under_jit_with_sharded_inputs(self, sp_mesh):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((2, 16, 4, 8)).astype(np.float32)
        mask = np.ones((2, 16), np.int32)
        f = jax.jit(lambda q, m: sp_attention(q, q, q, kv_mask=m))
        out = f(jnp.asarray(q), jnp.asarray(mask))
        ref = xla_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                            kv_mask=jnp.asarray(mask), causal=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_causal_matches_unsharded(self, sp_mesh):
        """Causal SP attention (Evo2 striped attention layers): each device's
        queries get their chunk-start offset in the causal mask."""
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, (2, 16)), jnp.int32).at[:, -1].set(1)
        out_sp = sp_attention(q, k, v, kv_mask=mask, causal=True)
        out_ref = xla_attention(q, k, v, kv_mask=mask, causal=True)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_requires_registration(self):
        disable_sequence_sharding()
        q = jnp.zeros((1, 8, 2, 4))
        with pytest.raises(RuntimeError, match="enable_sequence_sharding"):
            sp_attention(q, q, q)


class TestSPEncoder:
    def test_encoder_forward_matches_xla(self, sp_mesh):
        from bioreason_tpu.models.nt_encoder import encoder_forward, init_encoder
        cfg = EncoderConfig.tiny()                      # attention_impl="xla"
        params = init_encoder(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(2).integers(6, 100, (4, 32)).astype(np.int32)
        mask = np.ones((4, 32), np.int32)
        mask[0, :8] = 0                                 # left padding
        ref = encoder_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        sp_cfg = dataclasses.replace(cfg, attention_impl="sp")
        got = encoder_forward(params, sp_cfg,
                              shard_sequence(ids), shard_sequence(mask))
        np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                                   np.asarray(ref).astype(np.float32),
                                   atol=2e-5, rtol=2e-5)


class TestSPLocalAttention:
    """Banded attention composed with sequence parallelism: window-token
    halo exchange (not a full K/V all-gather). Must equal the unsharded
    banded kernel exactly."""

    def _data(self, t, seed, hq=4, hkv=2):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((2, t, hq, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, t, hkv, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, t, hkv, 8)), jnp.float32)
        mask = np.ones((2, t), np.int32)
        mask[0, :5] = 0
        return q, k, v, jnp.asarray(mask)

    def test_halo_path_matches_unsharded(self, sp_mesh):
        from bioreason_tpu.ops.local_attention import local_attention
        from bioreason_tpu.parallel.sp import sp_local_attention
        q, k, v, mask = self._data(32, 5)          # chunk 16, window 6 < chunk
        want = local_attention(q, k, v, 6, kv_mask=mask, interpret=True)
        got = sp_local_attention(q, k, v, 6, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_gather_fallback_matches(self, sp_mesh):
        from bioreason_tpu.ops.local_attention import local_attention
        from bioreason_tpu.parallel.sp import sp_local_attention
        q, k, v, mask = self._data(32, 6)          # window 20 >= chunk 16
        want = local_attention(q, k, v, 20, kv_mask=mask, interpret=True)
        got = sp_local_attention(q, k, v, 20, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_routing_via_attention_impl(self, sp_mesh):
        from bioreason_tpu.models.attention import attention
        from bioreason_tpu.ops.local_attention import local_attention
        q, k, v, mask = self._data(32, 7)
        want = local_attention(q, k, v, 8, kv_mask=mask, interpret=True)
        got = attention(q, k, v, kv_mask=mask, impl="sp_local:8")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


class TestSPHyena:
    """Evo2/hyena tower sequence parallelism (parallel/sp_hyena.py): every op
    must match the unsharded operator exactly — halo-exchange convs and the
    chunked-state modal form are algebraic rewrites, not approximations."""

    def test_causal_conv_matches(self, sp_mesh):
        from bioreason_tpu.models.evo2 import _depthwise_causal_conv
        from bioreason_tpu.parallel.sp_hyena import sp_causal_conv
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 32, 6)), jnp.float32)
        for k in (1, 3, 7):                       # halo path (chunk=16 >= k-1)
            filt = jnp.asarray(rng.standard_normal((6, k)), jnp.float32)
            ref = _depthwise_causal_conv(x, filt)
            got = sp_causal_conv(x, filt)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)

    def test_long_filter_fft_path_matches(self, sp_mesh):
        """k>16 routes through the local FFT conv; still exact with the halo."""
        from bioreason_tpu.models.evo2 import _depthwise_causal_conv
        from bioreason_tpu.parallel.sp_hyena import sp_causal_conv
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 48, 4)), jnp.float32)
        filt = jnp.asarray(rng.standard_normal((4, 20)), jnp.float32)
        ref = _depthwise_causal_conv(x, filt)
        got = sp_causal_conv(x, filt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_chunk_shorter_than_filter_falls_back(self, sp_mesh):
        """chunk (8) < k-1 (11): the all-gather fallback must stay exact."""
        from bioreason_tpu.models.evo2 import _depthwise_causal_conv
        from bioreason_tpu.parallel.sp_hyena import sp_causal_conv
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
        filt = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)
        ref = _depthwise_causal_conv(x, filt)
        got = sp_causal_conv(x, filt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_li_conv_chunked_state_matches_fft(self, sp_mesh):
        """The modal chunked-state decomposition equals the full-length FFT
        conv: local conv + Re(Σ r·p^{t+1}·S) tail."""
        from bioreason_tpu.models.evo2 import (_fft_causal_conv,
                                               _materialize_li_filter)
        from bioreason_tpu.parallel.sp_hyena import sp_li_conv
        rng = np.random.default_rng(3)
        d, order, t = 6, 4, 32
        fp = {"poles": jnp.asarray(rng.standard_normal((d, order, 2)), jnp.float32),
              "residues": jnp.asarray(
                  rng.standard_normal((d, order, 2)) * 0.3, jnp.float32)}
        g = jnp.asarray(rng.standard_normal((2, t, d)), jnp.float32)
        ref = _fft_causal_conv(g, _materialize_li_filter(fp, t))
        got = sp_li_conv(g, fp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-3)

    def test_hyena_forward_sp_matches_xla(self, sp_mesh):
        """Full tower (se/mr/li + striped attention + tap) under SP equals the
        unsharded forward, including left-pad masking."""
        import dataclasses as dc
        from bioreason_tpu.config import HyenaConfig
        from bioreason_tpu.models.evo2 import hyena_forward, init_hyena
        cfg = HyenaConfig.tiny()                      # 4 layers: se, mr, li, attn
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(4)
        ids = rng.integers(2, 70, (2, 32)).astype(np.int32)
        mask = np.ones((2, 32), np.int32)
        mask[0, :5] = 0                               # left padding
        ref = hyena_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        sp_cfg = dc.replace(cfg, attention_impl="sp")
        got = hyena_forward(params, sp_cfg, shard_sequence(ids),
                            shard_sequence(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-3)
        # named-layer tap under SP too (dna_llm.py:127-146 semantics)
        ref_tap = hyena_forward(params, cfg, jnp.asarray(ids),
                                jnp.asarray(mask), tap_layer=2)
        got_tap = hyena_forward(params, sp_cfg, shard_sequence(ids),
                                shard_sequence(mask), tap_layer=2)
        np.testing.assert_allclose(np.asarray(got_tap), np.asarray(ref_tap),
                                   atol=2e-4, rtol=2e-3)


class TestSPTraining:
    def test_sft_step_matches_unsharded(self):
        from bioreason_tpu.config import LoRAConfig, OptimConfig, SFTConfig
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import (format_kegg_for_dna_llm,
                                             synthetic_kegg_items)
        from bioreason_tpu.train.sft import SFTTrainer

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        items = [format_kegg_for_dna_llm(it)
                 for it in synthetic_kegg_items(4, seq_len=48, seed=0)]
        batch = sft_collate(items, proc, max_length_text=512, max_length_dna=64)
        sft_cfg = SFTConfig(batch_size=4, max_length_dna=64,
                            optim=OptimConfig(total_steps=4),
                            lora=LoRAConfig(r=4, alpha=8, dropout=0.0))

        losses = {}
        for name, impl in [("base", "xla"), ("sp", "sp")]:
            mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
            fusion_cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                           dna_pad_token_id=tok.dna_pad_id)
            fusion_cfg = dataclasses.replace(
                fusion_cfg, encoder=dataclasses.replace(
                    fusion_cfg.encoder, attention_impl=impl))
            trainer = SFTTrainer(fusion_cfg, sft_cfg, mesh=mesh)
            losses[name] = trainer.train_step(batch)["loss"]
        disable_sequence_sharding()
        assert np.isfinite(losses["sp"])
        np.testing.assert_allclose(losses["sp"], losses["base"], atol=1e-4)
