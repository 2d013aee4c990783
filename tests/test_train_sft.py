import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioreason_tpu.config import (FusionConfig, SFTConfig, MeshConfig, LoRAConfig,
                                  OptimConfig)
from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_for_dna_llm
from bioreason_tpu.data.collate import sft_collate
from bioreason_tpu.models import init_fusion, fusion_forward
from bioreason_tpu.parallel import make_mesh
from bioreason_tpu.train.lora import attach_lora, merge_lora, strip_lora
from bioreason_tpu.train.sft import SFTTrainer
from bioreason_tpu.train import trainable as T

TOK = ByteTextTokenizer()
PROC = BioProcessor(TOK, KmerTokenizer())


def tiny_cfgs(lora=True):
    fusion = FusionConfig.tiny(text_vocab=TOK.vocab_size, dna_pad_token_id=TOK.dna_pad_id)
    sft = SFTConfig(batch_size=2, max_length_dna=64, bucket=None,
                    optim=OptimConfig(learning_rate=1e-2, total_steps=20),
                    lora=LoRAConfig(r=4, alpha=8) if lora else None)
    return fusion, sft


def make_batch(n=2, seed=0):
    items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(n, seq_len=40, seed=seed)]
    return sft_collate(items, PROC, max_length_text=512, max_length_dna=64)


class TestLoRA:
    def test_attach_is_identity_at_init(self):
        fusion, _ = tiny_cfgs()
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        lparams = attach_lora(jax.random.PRNGKey(1), params, LoRAConfig(r=4, alpha=8))
        batch = make_batch()
        args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["dna_input_ids"]), jnp.asarray(batch["dna_attention_mask"]))
        l1, _ = fusion_forward(params, fusion, *args)
        l2, _ = fusion_forward(lparams, fusion, *args)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    def test_excludes_encoder_embed_projection(self):
        fusion, _ = tiny_cfgs()
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        lparams = attach_lora(jax.random.PRNGKey(1), params, LoRAConfig(r=4, alpha=8))
        paths = ["/".join(str(getattr(k, "key", k)) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(lparams)[0]]
        lora_paths = [p for p in paths if "lora_a" in p]
        assert lora_paths, "no adapters attached"
        assert all(p.startswith("decoder/layers") for p in lora_paths)

    def test_merge_equals_adapter_forward(self):
        fusion, _ = tiny_cfgs()
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        lparams = attach_lora(jax.random.PRNGKey(1), params, LoRAConfig(r=4, alpha=8))
        # give lora_b nonzero values so merge actually changes weights
        lparams = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.01 if "lora_b" in "/".join(str(getattr(k, "key", k)) for k in p) else x,
            lparams)
        merged = merge_lora(lparams)
        batch = make_batch(seed=1)
        args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["dna_input_ids"]), jnp.asarray(batch["dna_attention_mask"]))
        l_adapter, _ = fusion_forward(lparams, fusion, *args)
        l_merged, _ = fusion_forward(merged, fusion, *args)
        np.testing.assert_allclose(np.asarray(l_adapter), np.asarray(l_merged),
                                   rtol=2e-2, atol=2e-2)
        # strip returns the base behavior
        l_base, _ = fusion_forward(params, fusion, *args)
        l_strip, _ = fusion_forward(strip_lora(lparams), fusion, *args)
        np.testing.assert_allclose(np.asarray(l_base), np.asarray(l_strip), atol=1e-5)


class TestSFTTrainer:
    def test_loss_decreases_and_frozen_stay_frozen(self):
        fusion, sft = tiny_cfgs()
        mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
        trainer = SFTTrainer(fusion, sft, mesh=mesh)
        frozen_before = jax.tree.map(lambda x: np.asarray(x), trainer.frozen_leaves)
        batch = make_batch(n=4, seed=2)
        losses = [trainer.train_step(batch)["loss"] for _ in range(5)]
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)
        for before, after in zip(frozen_before, trainer.frozen_leaves):
            np.testing.assert_array_equal(before, np.asarray(after))

    def test_trainable_selection(self):
        fusion, sft = tiny_cfgs()
        mesh = make_mesh(MeshConfig(data=8))
        trainer = SFTTrainer(fusion, sft, mesh=mesh)
        paths = T.trainable_paths(trainer.partition)
        assert any("lora_a" in p for p in paths)
        assert any("dna_projection" in p for p in paths)
        assert not any(p.startswith("encoder") for p in paths)
        assert not any("embed" in p for p in paths)

    def test_tp_mesh_runs(self):
        fusion, sft = tiny_cfgs()
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
        trainer = SFTTrainer(fusion, sft, mesh=mesh)
        batch = make_batch(n=4, seed=3)
        m = trainer.train_step(batch)
        assert np.isfinite(m["loss"])

    def test_eval_step(self):
        fusion, sft = tiny_cfgs()
        trainer = SFTTrainer(fusion, sft, mesh=make_mesh(MeshConfig(data=8)))
        loss = trainer.eval_step(make_batch(n=4, seed=4))
        assert np.isfinite(loss)


class TestLoRADropout:
    def test_dropout_changes_loss_stochastically(self):
        import jax
        import jax.numpy as jnp
        from bioreason_tpu.models.fusion import fusion_forward
        fusion, _ = tiny_cfgs()
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        lparams = attach_lora(jax.random.PRNGKey(1), params, LoRAConfig(r=4, alpha=8))
        # nonzero lora_b so the adapter branch actually contributes
        lparams = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.05 if "lora_b" in "/".join(
                str(getattr(k, "key", k)) for k in p) else x, lparams)
        batch = make_batch(seed=7)
        args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["dna_input_ids"]), jnp.asarray(batch["dna_attention_mask"]))
        kw = dict(labels=jnp.asarray(batch["labels"]))
        _, l_plain = fusion_forward(lparams, fusion, *args, **kw)
        _, l_d1 = fusion_forward(lparams, fusion, *args, **kw,
                                 lora_dropout_rng=jax.random.PRNGKey(3),
                                 lora_dropout_rate=0.5)
        _, l_d1b = fusion_forward(lparams, fusion, *args, **kw,
                                  lora_dropout_rng=jax.random.PRNGKey(3),
                                  lora_dropout_rate=0.5)
        _, l_d2 = fusion_forward(lparams, fusion, *args, **kw,
                                 lora_dropout_rng=jax.random.PRNGKey(4),
                                 lora_dropout_rate=0.5)
        assert float(l_d1) == float(l_d1b)            # deterministic per key
        assert float(l_d1) != float(l_d2)             # stochastic across keys
        assert float(l_d1) != float(l_plain)          # dropout has an effect
        # rate 0 == no dropout
        _, l_zero = fusion_forward(lparams, fusion, *args, **kw,
                                   lora_dropout_rng=jax.random.PRNGKey(5),
                                   lora_dropout_rate=0.0)
        np.testing.assert_allclose(float(l_zero), float(l_plain), rtol=1e-6)


class TestInt8Frozen:
    """QLoRA-style int8 frozen towers (train/quant.py)."""

    def test_int8_matches_bf16_loss_and_learns(self):
        import jax
        import numpy as np
        from bioreason_tpu.config import (FusionConfig, LoRAConfig, OptimConfig,
                                          SFTConfig)
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import (format_kegg_for_dna_llm,
                                             synthetic_kegg_items)
        from bioreason_tpu.train.sft import SFTTrainer

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        fusion = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                   dna_pad_token_id=tok.dna_pad_id)
        items = [format_kegg_for_dna_llm(x)
                 for x in synthetic_kegg_items(4, seq_len=32, seed=0)]
        batch = sft_collate(items, proc, max_length_text=512, max_length_dna=64)

        def make(frozen_dtype):
            cfg = SFTConfig(batch_size=4, max_length_dna=64,
                            optim=OptimConfig(learning_rate=1e-3, total_steps=5),
                            lora=LoRAConfig(r=4, alpha=8, dropout=0.0),
                            frozen_dtype=frozen_dtype, seed=7)
            return SFTTrainer(fusion, cfg, rng=jax.random.PRNGKey(7))

        t8 = make("int8")
        # quantized kernels present as {q, scale} subtrees
        qk = t8.params["decoder"]["layers"]["attn"]["q"]["kernel"]
        assert isinstance(qk, dict) and qk["q"].dtype == np.int8
        losses8 = [t8.train_step(batch)["loss"] for _ in range(5)]
        assert all(np.isfinite(l) for l in losses8)
        assert losses8[-1] < losses8[0]

        # loss close to the bf16-frozen trainer (per-channel int8 ~ <1% err)
        tb = make("bfloat16")
        loss_b = tb.train_step(batch)["loss"]
        assert abs(losses8[0] - loss_b) / abs(loss_b) < 0.05

    def test_int8_requires_lora_frozen_encoder(self):
        import pytest as _pytest
        from bioreason_tpu.config import FusionConfig, SFTConfig
        from bioreason_tpu.train.sft import SFTTrainer
        fusion = FusionConfig.tiny()
        with _pytest.raises(ValueError, match="int8"):
            SFTTrainer(fusion, SFTConfig(frozen_dtype="int8", lora=None))


class TestAsyncCheckpoint:
    def test_async_save_snapshot_is_donation_safe(self, tmp_path):
        """save(block=False) snapshots on-device BEFORE returning; the next
        (donating) train step must not corrupt the checkpoint, and the saved
        state equals the state at save time."""
        from bioreason_tpu.train.checkpoint import load_checkpoint, load_metadata
        fusion, sft = tiny_cfgs()
        trainer = SFTTrainer(fusion, sft)
        batch = make_batch()
        trainer.train_step(batch)
        want = [np.asarray(l).copy() for l in trainer.train_leaves
                if hasattr(l, "shape")]
        path = str(tmp_path / "ck")
        trainer.save(path, block=False)
        # donate the live buffers while the save is in flight
        trainer.train_step(batch)
        trainer.train_step(batch)
        trainer.finish_saves()
        state = load_checkpoint(path, like={"params": trainer.params,
                                            "opt_state": trainer.opt_state})
        got, _ = T.split(trainer.partition, state["params"])
        got = [np.asarray(l) for l in got if hasattr(l, "shape")]
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
        assert load_metadata(path)["step"] == 1

    def test_async_equals_sync(self, tmp_path):
        from bioreason_tpu.train.checkpoint import load_checkpoint
        fusion, sft = tiny_cfgs()
        trainer = SFTTrainer(fusion, sft)
        trainer.train_step(make_batch())
        p_sync, p_async = str(tmp_path / "s"), str(tmp_path / "a")
        trainer.save(p_sync, block=True)
        trainer.save(p_async, block=False)
        trainer.finish_saves()
        like = {"params": trainer.params, "opt_state": trainer.opt_state}
        a = jax.tree.leaves(load_checkpoint(p_sync, like=like))
        b = jax.tree.leaves(load_checkpoint(p_async, like=like))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestProbeEarlyStopCLI:
    def test_probe_markers_and_stop(self, tmp_path):
        """cli.train_sft --probe_markers/--stop_probe_acc: probes log at
        every eval, the rate-limited keeper saves params-only checkpoints,
        and a 0.0 threshold exercises the non-stop path while focal_gamma>0
        exercises the focal train loss."""
        from bioreason_tpu.cli import train_sft as cli

        trainer = cli.main([
            "--decoder", "tiny", "--encoder", "tiny", "--cpu_devices", "1",
            "--n_synthetic", "16", "--batch_size", "4", "--num_epochs", "2",
            "--max_length_dna", "64", "--dna_kmer", "1", "--no_lora",
            "--dna_model_finetune", "--supervise_eos", "--focal_gamma", "2",
            "--eval_every", "2", "--keep_top_k", "1",
            "--probe_markers", '{"answer": "Answer: "}',
            "--stop_probe_acc", "0.0",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--log_dir", str(tmp_path / "logs")])
        assert trainer.step > 0
        # probe metrics logged
        import json as _json
        rows = [_json.loads(l) for l in
                open(tmp_path / "logs" / "metrics.jsonl", encoding="utf-8")]
        probe_rows = [r for r in rows if "val/probe_answer_acc" in r]
        assert probe_rows, "probe metrics missing from the log"
        assert all(0.0 <= r["val/probe_answer_acc"] <= 1.0 for r in probe_rows)
        # params-only best-k checkpoint loads with a params-like tree
        from bioreason_tpu.train.checkpoint import TopKKeeper, load_checkpoint
        keeper = TopKKeeper(str(tmp_path / "ckpt" / "best"), k=1)
        best = keeper.best_path()
        assert best is not None
        params = load_checkpoint(best, like=trainer.params)
        assert set(params) == set(trainer.params)
