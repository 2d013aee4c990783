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

    def test_causal_rejected(self, sp_mesh):
        q = jnp.zeros((1, 8, 2, 4))
        with pytest.raises(NotImplementedError):
            sp_attention(q, q, q, causal=True)

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
