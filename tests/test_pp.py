"""Pipeline parallelism (parallel/pp.py): GPipe schedule over decoder layers.

The reference declares a PP plan in its dead DLConfig
(configuration_dl.py:159-163) but never implements it; here the mechanism
exists with forward AND gradient parity against the plain decoder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.config import DecoderConfig
from bioreason_tpu.models.qwen3 import decoder_forward, init_decoder
from bioreason_tpu.parallel.pp import pp_decoder_forward

CFG = dataclasses.replace(DecoderConfig.tiny(vocab_size=64), num_layers=4)


@pytest.fixture(scope="module")
def setup():
    from jax.sharding import Mesh
    params = init_decoder(jax.random.PRNGKey(0), CFG)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (8, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[0, :3] = 0                                  # left padding
    return params, mesh, jnp.asarray(ids), jnp.asarray(mask)


class TestPipelineParallel:
    def test_forward_matches_plain(self, setup):
        params, mesh, ids, mask = setup
        ref, _ = decoder_forward(params, CFG, input_ids=ids, attention_mask=mask)
        got = pp_decoder_forward(params, CFG, ids, mask, mesh=mesh, n_micro=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_n_micro_variants(self, setup):
        params, mesh, ids, mask = setup
        ref, _ = decoder_forward(params, CFG, input_ids=ids, attention_mask=mask)
        for m in (1, 2, 8):
            got = pp_decoder_forward(params, CFG, ids, mask, mesh=mesh, n_micro=m)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4, err_msg=f"M={m}")

    def test_gradients_flow_through_pipeline(self, setup):
        """AD through ppermute + scan: the backward pipeline falls out of
        jax.grad; grads match the plain decoder's."""
        params, mesh, ids, mask = setup

        def loss_pp(p):
            lg = pp_decoder_forward(p, CFG, ids, mask, mesh=mesh, n_micro=2)
            return (lg.astype(jnp.float32) ** 2).mean()

        def loss_ref(p):
            lg, _ = decoder_forward(p, CFG, input_ids=ids, attention_mask=mask)
            return (lg.astype(jnp.float32) ** 2).mean()

        g_pp = jax.grad(loss_pp)(params)
        g_ref = jax.grad(loss_ref)(params)
        flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
        flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
        for a, b in zip(flat_pp, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4)

    def test_sharded_params_stay_sharded(self, setup):
        from jax.sharding import NamedSharding, PartitionSpec as P
        params, mesh, ids, mask = setup
        layer_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P("model")), params["layers"])
        sharded = dict(params, layers=jax.device_put(params["layers"],
                                                     layer_sharding))
        got = jax.jit(lambda p: pp_decoder_forward(p, CFG, ids, mask,
                                                   mesh=mesh, n_micro=4))(sharded)
        ref, _ = decoder_forward(params, CFG, input_ids=ids, attention_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_invalid_shapes_raise(self, setup):
        params, mesh, ids, mask = setup
        with pytest.raises(ValueError, match="not divisible"):
            pp_decoder_forward(params, CFG, ids, mask, mesh=mesh, n_micro=3)
        bad_cfg = dataclasses.replace(CFG, num_layers=3)
        bad = init_decoder(jax.random.PRNGKey(1), bad_cfg)
        with pytest.raises(ValueError, match="stages"):
            pp_decoder_forward(bad, bad_cfg, ids, mask, mesh=mesh, n_micro=4)


class TestPPTrainer:
    """SFTConfig.pp_micro wires the GPipe pipeline into the full trainer:
    decoder layers shard one stage per 'model'-axis device, the batch stays
    DP-sharded over 'data'/'fsdp', and losses match the TP/scan trainer."""

    def _make(self, pp_micro, mesh_cfg, dropout=0.0):
        from bioreason_tpu.config import (FusionConfig, LoRAConfig, OptimConfig,
                                          SFTConfig)
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import format_kegg_for_dna_llm, synthetic_kegg_items
        from bioreason_tpu.parallel import make_mesh
        from bioreason_tpu.train.sft import SFTTrainer

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        fusion_cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                       dna_pad_token_id=tok.dna_pad_id)
        # warmup_ratio=0: with warmup, step 0's lr is exactly 0 and the
        # params don't move, so the two-step dropout test would see
        # bit-identical losses (LoRA b=0 makes dropout loss-neutral)
        cfg = SFTConfig(batch_size=8, max_length_dna=64,
                        optim=OptimConfig(total_steps=4, warmup_ratio=0.0),
                        lora=LoRAConfig(r=4, alpha=8, dropout=dropout),
                        pp_micro=pp_micro)
        trainer = SFTTrainer(fusion_cfg, cfg, mesh=make_mesh(mesh_cfg))
        items = [format_kegg_for_dna_llm(it)
                 for it in synthetic_kegg_items(8, seq_len=48, seed=0)]
        batch = sft_collate(items, proc, max_length_text=256, max_length_dna=64)
        return trainer, batch

    def test_pp_trainer_loss_matches_tp(self):
        from bioreason_tpu.config import MeshConfig
        t_pp, batch = self._make(2, MeshConfig(data=2, fsdp=2, model=2))
        t_tp, _ = self._make(0, MeshConfig(data=2, fsdp=2, model=2))
        m_pp = t_pp.train_step(batch)
        m_tp = t_tp.train_step(batch)
        assert np.isfinite(m_pp["loss"]) and m_pp["grad_norm"] > 0
        np.testing.assert_allclose(m_pp["loss"], m_tp["loss"], rtol=2e-3)

    def test_pp_trainer_with_dropout_runs(self):
        from bioreason_tpu.config import MeshConfig
        t_pp, batch = self._make(2, MeshConfig(data=4, fsdp=1, model=2),
                                 dropout=0.1)
        m1 = t_pp.train_step(batch)
        m2 = t_pp.train_step(batch)
        assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
        assert m2["loss"] != m1["loss"]          # the update moved the params
