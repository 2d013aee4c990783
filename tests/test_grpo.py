import jax
import numpy as np
import pytest

from bioreason_tpu.config import (FusionConfig, GRPOConfig, LoRAConfig, MeshConfig,
                                  OptimConfig, SamplingConfig)
from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_prompt_only
from bioreason_tpu.train.dataflow import repeat_random_indices
from bioreason_tpu.parallel import make_mesh
from bioreason_tpu.train.grpo import GRPOTrainer
from bioreason_tpu.train.rewards import (REWARD_REGISTRY, correctness_reward,
                                         extract_answer, xmlcount_reward)

TOK = ByteTextTokenizer()
PROC = BioProcessor(TOK, KmerTokenizer())


class TestRewards:
    def test_extract_answer(self):
        assert extract_answer("<think>\nhm\n</think>\n\nAnswer: x") == "Answer: x"
        assert extract_answer("no think") == "no think"

    def test_correctness_per_example(self):
        comps = ["</think>p53 pathway", "</think>wnt", "</think>p53"]
        answers = ["p53", "p53", "p53"]
        out = correctness_reward([], comps, answers)
        assert out == [2.0, 0.0, 2.0]

    def test_xmlcount(self):
        assert xmlcount_reward([], ["<think>\nx\n</think>\ny"])[0] == 0.25
        assert xmlcount_reward([], ["nothing"])[0] == 0.0

    def test_registry_complete(self):
        assert set(REWARD_REGISTRY) == {"xmlcount", "soft_format", "strict_format",
                                        "less_than_4", "correctness"}


def make_trainer(G=2, batch=4, beta=0.04, mu=1, **kw):
    fusion = FusionConfig.tiny(text_vocab=TOK.vocab_size, dna_pad_token_id=TOK.dna_pad_id)
    cfg = GRPOConfig(
        num_generations=G, batch_size=batch, beta=beta, num_iterations=mu,
        max_completion_length=8,
        sampling=SamplingConfig(temperature=1.0, top_k=10, top_p=0.95, max_new_tokens=8),
        optim=OptimConfig(learning_rate=1e-3, total_steps=10),
        lora=kw.pop("lora", LoRAConfig(r=4, alpha=8)), **kw)
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
    return GRPOTrainer(fusion, cfg, PROC,
                       [REWARD_REGISTRY["correctness"], REWARD_REGISTRY["xmlcount"]],
                       mesh=mesh)


def make_items(n_prompts, G):
    raw = [format_kegg_prompt_only(it) for it in synthetic_kegg_items(n_prompts, seq_len=24)]
    idx = next(repeat_random_indices(n_prompts, n_prompts, G, seed=0, epoch=0))
    return [raw[i] for i in idx]


class TestRepeatSampler:
    def test_contiguous_groups(self):
        idx = next(repeat_random_indices(6, 3, 4, seed=1, epoch=0))
        assert len(idx) == 12
        for g in range(3):
            group = idx[g * 4:(g + 1) * 4]
            assert len(set(group)) == 1


class TestGRPOTrainer:
    def test_divisibility_check(self):
        with pytest.raises(AssertionError, match="divisible"):
            make_trainer(G=3, batch=4)

    def test_step_runs_and_metrics(self):
        trainer = make_trainer(G=2, batch=4, beta=0.04)
        items = make_items(2, 2)
        m = trainer.step(items)
        for key in ("loss", "kl", "clip_ratio", "reward", "reward_std",
                    "completion_length", "rewards/correctness_reward"):
            assert key in m, key
            assert np.isfinite(m[key]), key
        # step again: params update path works repeatedly
        m2 = trainer.step(items)
        assert np.isfinite(m2["loss"])

    def test_mu_buffering_reuses_rollout(self):
        trainer = make_trainer(G=2, batch=4, beta=0.0, mu=2)
        items = make_items(2, 2)
        trainer.step(items)
        buf1 = trainer._buffers[0]
        trainer.step(items)          # mu=2: second step must reuse the buffer
        assert trainer._buffers[0] is buf1
        trainer.step(items)          # third step regenerates
        assert trainer._buffers[0] is not buf1

    def test_ref_policy_shares_frozen_buffers_under_lora(self):
        # the ref tree must alias the frozen tower buffers (never donated)
        # instead of deep-copying ~tower-size HBM (at 4B that copy alone is
        # ~8 GB); only the TRAINABLE leaves surviving strip_lora (the
        # dna_projection) are copies, because the update donates them
        trainer = make_trainer(G=2, batch=4, beta=0.04)
        frozen_ids = {id(l) for l in jax.tree.leaves(trainer.frozen_leaves)}
        import jax.tree_util as jtu
        copied = [jtu.keystr(p)
                  for p, l in jtu.tree_flatten_with_path(trainer._ref_params)[0]
                  if id(l) not in frozen_ids]
        assert copied and all("dna_projection" in k for k in copied), copied

    def test_frozen_int8_step_runs_and_rollout_shares_kernels(self):
        trainer = make_trainer(G=2, batch=4, beta=0.04, frozen_dtype="int8",
                               rollout_int8=True)
        # training tree holds int8 kernels
        import jax.numpy as jnp
        kinds = {l.dtype for l in jax.tree.leaves(trainer.frozen_leaves)
                 if hasattr(l, "dtype")}
        # equality, not set membership: np.dtype('int8') == jnp.int8 but
        # their hashes differ, so `jnp.int8 in kinds` is env-dependent
        assert any(d == jnp.int8 for d in kinds)
        m = trainer.step(make_items(2, 2))
        assert np.isfinite(m["loss"])
        # rollout quantization must not duplicate already-int8 kernels
        from bioreason_tpu.train import trainable as T
        params = T.combine(trainer.partition, trainer.train_leaves,
                           trainer.frozen_leaves)
        rp = trainer._rollout_params(params)
        dec = params["decoder"]["layers"]["attn"]["q"]["kernel"]
        rdec = rp["decoder"]["layers"]["attn"]["q"]["kernel"]
        assert rdec["q"] is dec["q"]

    def test_frozen_int8_validation(self):
        with pytest.raises(ValueError, match="requires LoRA"):
            make_trainer(G=2, batch=4, frozen_dtype="int8", lora=None)
        with pytest.raises(ValueError, match="sync_ref_model"):
            make_trainer(G=2, batch=4, frozen_dtype="int8",
                         sync_ref_model=True)

    def test_advantages_group_normalized(self):
        trainer = make_trainer(G=2, batch=4, beta=0.0)
        items = make_items(2, 2)
        out = trainer._generate_and_score(items)
        adv = np.asarray(out["batch"]["advantages"]).reshape(-1, 2)
        np.testing.assert_allclose(adv.sum(axis=1), 0.0, atol=1e-4)

    def test_async_save_matches_sync(self, tmp_path):
        """save(block=False) snapshots before the next (donating) step; the
        written state equals a blocking save taken at the same moment."""
        from bioreason_tpu.train.checkpoint import load_checkpoint, load_metadata
        trainer = make_trainer(G=2, batch=4)
        items = make_items(2, 2)
        trainer.step(items)
        p_sync, p_async = str(tmp_path / "s"), str(tmp_path / "a")
        trainer.save(p_sync, block=True)
        trainer.save(p_async, block=False)
        trainer.step(items)              # donates live buffers mid-flight
        trainer.finish_saves()
        like = {"params": trainer.params, "opt_state": trainer.opt_state}
        a = jax.tree.leaves(load_checkpoint(p_sync, like=like))
        b = jax.tree.leaves(load_checkpoint(p_async, like=like))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert load_metadata(p_async)["stage"] == "grpo"


class TestShardedDataPath:
    """GRPO batch arrays are device_put with the batch PartitionSpec
    (VERDICT r1 item 4): sharded-vs-single-device numerics must agree."""

    def test_logps_sharded_equal_single_device(self):
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from bioreason_tpu.models import init_fusion
        from bioreason_tpu.train.grpo import per_token_logps
        from bioreason_tpu.parallel.partition import (
            partition_rules_fusion, shardings_for_params, batch_spec, _valid_spec)

        fusion = FusionConfig.tiny(text_vocab=TOK.vocab_size,
                                   dna_pad_token_id=TOK.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        rng = np.random.default_rng(0)
        B, T, LD, clen = 8, 24, 16, 8
        dna_ids = rng.integers(6, 4102, (2 * B, LD)).astype(np.int32)
        dna_mask = np.ones((2 * B, LD), np.int32)
        ids = rng.integers(0, 256, (B, T)).astype(np.int32)
        ids[:, 2:2 + 2 * LD] = TOK.dna_pad_id
        mask = np.ones((B, T), np.int32)

        jit_logps = jax.jit(per_token_logps,
                            static_argnames=("cfg", "completion_len"))
        single = np.asarray(jit_logps(params, fusion, jnp.asarray(ids),
                                      jnp.asarray(mask), jnp.asarray(dna_ids),
                                      jnp.asarray(dna_mask), completion_len=clen))

        mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
        sp = shardings_for_params(params, partition_rules_fusion(), mesh)
        p_sh = jax.device_put(params, sp)

        def put(a):
            spec = _valid_spec(batch_spec(), a.shape, mesh)
            return jax.device_put(a, NamedSharding(mesh, spec))

        sharded = np.asarray(jit_logps(p_sh, fusion, put(ids), put(mask),
                                       put(dna_ids), put(dna_mask),
                                       completion_len=clen))
        np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=2e-4)

    def test_engine_inputs_sharded(self):
        """Engine with a mesh shards prompt inputs; generation still works and
        matches greedy output of the meshless engine."""
        from bioreason_tpu.generate import GenerationEngine
        from bioreason_tpu.models import init_fusion

        fusion = FusionConfig.tiny(text_vocab=TOK.vocab_size,
                                   dna_pad_token_id=TOK.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        rng = np.random.default_rng(1)
        B, T = 8, 16
        ids = rng.integers(0, 256, (B, T)).astype(np.int32)
        mask = np.ones((B, T), np.int32)

        plain = GenerationEngine(fusion, eos_token_id=TOK.eos_token_id)
        t0, m0 = plain.generate(params, ids, mask, max_new_tokens=6, greedy=True)

        mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
        from bioreason_tpu.parallel.partition import (partition_rules_fusion,
                                                      shardings_for_params)
        p_sh = jax.device_put(params, shardings_for_params(
            params, partition_rules_fusion(), mesh))
        sh = GenerationEngine(fusion, eos_token_id=TOK.eos_token_id, mesh=mesh)
        t1, m1 = sh.generate(p_sh, ids, mask, max_new_tokens=6, greedy=True)
        np.testing.assert_array_equal(t0, t1)
        np.testing.assert_array_equal(m0, m1)


class TestRolloutInt8:
    def test_step_runs_and_learns_signal(self):
        """rollout_int8: device-side quantized rollouts feed the standard
        update; loss/reward finite, LoRA leaves actually change."""
        import jax
        from bioreason_tpu.config import (FusionConfig, GRPOConfig, LoRAConfig,
                                          OptimConfig, SamplingConfig)
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.kegg import (format_kegg_prompt_only,
                                             synthetic_kegg_items)
        from bioreason_tpu.train.grpo import GRPOTrainer
        from bioreason_tpu.train.rewards import get_reward_funcs

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        fusion_cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                       dna_pad_token_id=tok.dna_pad_id)
        cfg = GRPOConfig(num_generations=2, batch_size=4, beta=0.04,
                         num_iterations=1, max_completion_length=12,
                         rollout_int8=True,
                         sampling=SamplingConfig(max_new_tokens=12),
                         optim=OptimConfig(total_steps=2),
                         lora=LoRAConfig(r=2, alpha=4))
        trainer = GRPOTrainer(fusion_cfg, cfg, proc,
                              get_reward_funcs(["xmlcount"]))
        assert trainer._jit_rollout_quant is not None
        # the quantized tree must carry int8 kernels + embedding
        import bioreason_tpu.train.trainable as T
        params = T.combine(trainer.partition, trainer.train_leaves,
                           trainer.frozen_leaves)
        q = trainer._jit_rollout_quant(params)
        assert str(q["decoder"]["embed"]["embedding"]["q"].dtype) == "int8"
        assert str(q["decoder"]["layers"]["attn"]["q"]["kernel"]["q"].dtype) == "int8"
        prompts = [format_kegg_prompt_only(it)
                   for it in synthetic_kegg_items(2, seq_len=24, seed=0)]
        m = trainer.step([p for p in prompts for _ in range(2)])
        assert np.isfinite(m["loss"]) and np.isfinite(m["reward"])
        assert len(trainer.last_completions) == 4
        assert m["completion_length"] > 0


class TestGradAccumulation:
    """grad_accum_steps=N: N micro-batches must produce EXACTLY the update
    of the equivalent single big batch (reference buffers per accum step,
    grpo_trainer.py:399-403; optax.MultiSteps running-mean gradient)."""

    def _mk(self, accum, batch):
        fusion = FusionConfig.tiny(text_vocab=TOK.vocab_size,
                                   dna_pad_token_id=TOK.dna_pad_id)
        cfg = GRPOConfig(
            num_generations=2, batch_size=batch, beta=0.0, num_iterations=1,
            max_completion_length=8, grad_accum_steps=accum,
            sampling=SamplingConfig(max_new_tokens=8),
            optim=OptimConfig(learning_rate=1e-3, total_steps=10),
            lora=LoRAConfig(r=4, alpha=8))
        import jax as _jax
        mesh = make_mesh(MeshConfig(data=1, fsdp=1, model=1),
                         devices=_jax.devices()[:1])
        return GRPOTrainer(fusion, cfg, PROC,
                           [REWARD_REGISTRY["correctness"]], mesh=mesh)

    @staticmethod
    def _batch(rng, b, t, clen):
        ids = rng.integers(3, TOK.vocab_size - 10, (b, t)).astype(np.int32)
        mask = np.ones((b, t), np.int32)
        cmask = np.ones((b, clen), np.int32)
        adv = rng.normal(size=(b,)).astype(np.float32)
        return {"full_ids": ids, "full_mask": mask, "completion_mask": cmask,
                "advantages": adv}

    def test_accum_matches_big_batch(self):
        rng = np.random.default_rng(0)
        clen, t = 8, 32
        b1 = self._batch(rng, 4, t, clen)
        b2 = self._batch(rng, 4, t, clen)
        big = {k: np.concatenate([b1[k], b2[k]], axis=0) for k in b1}

        ta = self._mk(accum=2, batch=4)
        tb = self._mk(accum=1, batch=8)
        # identical inits (same seed)
        for x, y in zip(ta.train_leaves, tb.train_leaves):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        for micro in (b1, b2):
            ta.train_leaves, ta.opt_state, _ = ta._jit_update(
                ta.train_leaves, ta.frozen_leaves, ta.opt_state,
                {k: jax.numpy.asarray(v) for k, v in micro.items()},
                completion_len=clen)
        tb.train_leaves, tb.opt_state, _ = tb._jit_update(
            tb.train_leaves, tb.frozen_leaves, tb.opt_state,
            {k: jax.numpy.asarray(v) for k, v in big.items()},
            completion_len=clen)

        for x, y in zip(ta.train_leaves, tb.train_leaves):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       rtol=2e-5, atol=2e-6)

    def test_micro_steps_defer_update(self):
        """The first N-1 micro-steps must leave the params untouched."""
        rng = np.random.default_rng(1)
        ta = self._mk(accum=2, batch=4)
        before = [np.asarray(x).copy() for x in ta.train_leaves]
        micro = self._batch(rng, 4, 32, 8)
        ta.train_leaves, ta.opt_state, _ = ta._jit_update(
            ta.train_leaves, ta.frozen_leaves, ta.opt_state,
            {k: jax.numpy.asarray(v) for k, v in micro.items()},
            completion_len=8)
        for x, y in zip(before, ta.train_leaves):
            np.testing.assert_array_equal(x, np.asarray(y))
