import os

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import (EncoderConfig, FusionConfig, HyenaConfig,
                                  OptimConfig, MeshConfig, SamplingConfig)
from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
from bioreason_tpu.data.collate import classifier_collate
from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_for_dna_llm
from bioreason_tpu.generate import GenerationEngine
from bioreason_tpu.models import init_fusion
from bioreason_tpu.models.evo2 import init_hyena, hyena_forward
from bioreason_tpu.parallel import make_mesh
from bioreason_tpu.train.classifier import ClassifierTrainer, multiclass_prf
from bioreason_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                            load_metadata, sft_to_grpo_params)
from bioreason_tpu.train.eval import evaluate_generative
from bioreason_tpu.train.lora import attach_lora
from bioreason_tpu.config import LoRAConfig


class TestHyena:
    def test_forward_shapes_and_causality(self):
        cfg = HyenaConfig.tiny()
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
        h = hyena_forward(params, cfg, ids)
        assert h.shape == (2, 16, cfg.hidden_size)
        # causality: changing a late token must not affect earlier hiddens
        ids2 = ids.at[0, 12].set((ids[0, 12] + 1) % cfg.vocab_size)
        h2 = hyena_forward(params, cfg, ids2)
        np.testing.assert_allclose(np.asarray(h[0, :12]), np.asarray(h2[0, :12]),
                                   rtol=1e-4, atol=1e-4)
        assert not np.allclose(np.asarray(h[0, 12:]), np.asarray(h2[0, 12:]))

    def test_embedding_tap(self):
        cfg = HyenaConfig.tiny()
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
        tap = hyena_forward(params, cfg, ids, tap_layer=1)
        final = hyena_forward(params, cfg, ids)
        assert tap.shape == final.shape
        assert not np.allclose(np.asarray(tap), np.asarray(final))

    def test_fusion_with_evo2_encoder(self):
        from bioreason_tpu.models import fusion_forward
        tok = ByteTextTokenizer()
        cfg = FusionConfig(
            decoder=FusionConfig.tiny(text_vocab=tok.vocab_size).decoder,
            encoder=EncoderConfig.tiny(),
            hyena=HyenaConfig.tiny(),
            encoder_kind="evo2",
            dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        dna_tok = CharDNATokenizer()
        proc = BioProcessor(tok, dna_tok)
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(2, seq_len=20)]
        from bioreason_tpu.data.collate import sft_collate
        batch = sft_collate(items, proc, max_length_text=256, max_length_dna=32)
        logits, loss = fusion_forward(
            params, cfg, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["dna_input_ids"]), jnp.asarray(batch["dna_attention_mask"]),
            labels=jnp.asarray(batch["labels"]))
        assert np.isfinite(float(loss))


class TestClassifierTrainer:
    def test_train_improves_loss(self):
        cfg = EncoderConfig.tiny()
        items = synthetic_kegg_items(8, seq_len=30, seed=1)
        labels = sorted({it["answer"] for it in items})
        label2id = {l: i for i, l in enumerate(labels)}
        batch = classifier_collate(items, KmerTokenizer(), label2id, max_length=32)
        trainer = ClassifierTrainer(cfg, num_classes=len(labels),
                                    optim=OptimConfig(learning_rate=1e-2, total_steps=10),
                                    mesh=make_mesh(MeshConfig(data=8)))
        m0 = trainer.train_step(batch)
        for _ in range(4):
            m = trainer.train_step(batch)
        assert m["loss"] < m0["loss"]
        assert 0.0 <= m["accuracy"] <= 1.0

    def test_multiclass_prf(self):
        preds = np.array([0, 1, 1, 0])
        labels = np.array([0, 1, 0, 0])
        m = multiclass_prf(preds, labels, 2)
        assert m["accuracy"] == 0.75


class TestCheckpoint:
    def test_roundtrip_and_handoff(self, tmp_path):
        tok = ByteTextTokenizer()
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        params = attach_lora(jax.random.PRNGKey(1), params, LoRAConfig(r=4, alpha=8))
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params, step=7, stage="sft")
        meta = load_metadata(path)
        assert meta["step"] == 7 and meta["stage"] == "sft"
        restored = load_checkpoint(path, like=params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # SFT -> GRPO handoff: merged base + fresh adapters
        grpo_params = sft_to_grpo_params(restored, jax.random.PRNGKey(2), LoRAConfig(r=4, alpha=8))
        lb = [p for p, _ in zip(*[iter([])],)] if False else None
        flat = jax.tree_util.tree_flatten_with_path(grpo_params)[0]
        lora_b = [np.asarray(v) for p, v in flat
                  if "lora_b" in "/".join(str(getattr(k, 'key', k)) for k in p)]
        assert lora_b and all((b == 0).all() for b in lora_b)


class TestEvalHarness:
    def test_binary_metrics_and_csv(self, tmp_path):
        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, eos_token_id=tok.eos_token_id)
        items = synthetic_kegg_items(4, seq_len=20, seed=3)
        # force binary labels
        for i, it in enumerate(items):
            it["answer"] = "pathogenic" if i % 2 else "benign"
        examples = [format_kegg_for_dna_llm(it) for it in items]
        csv_path = str(tmp_path / "gen.csv")
        res = evaluate_generative(
            engine, params, proc, examples, labels=("benign", "pathogenic"),
            sampling=SamplingConfig(max_new_tokens=4), max_new_tokens=4,
            batch_size=2, greedy=True, csv_path=csv_path, max_length_dna=32)
        assert res.total == 4
        assert res.true_positives + res.false_negatives == 2
        assert res.true_negatives + res.false_positives == 2
        assert os.path.exists(csv_path)
        assert 0.0 <= res.accuracy <= 1.0


class TestTrainerResume:
    def test_sft_save_restore_roundtrip(self, tmp_path):
        from bioreason_tpu.config import (FusionConfig, SFTConfig, MeshConfig,
                                          LoRAConfig, OptimConfig)
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import format_kegg_for_dna_llm
        from bioreason_tpu.parallel import make_mesh
        from bioreason_tpu.train.sft import SFTTrainer
        from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        fusion = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                   dna_pad_token_id=tok.dna_pad_id)
        cfg = SFTConfig(batch_size=2, max_length_dna=64, bucket=None,
                        optim=OptimConfig(learning_rate=1e-2, total_steps=10),
                        lora=LoRAConfig(r=4, alpha=8))
        mesh = make_mesh(MeshConfig(data=8))
        trainer = SFTTrainer(fusion, cfg, mesh=mesh)
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(2, seq_len=30)]
        batch = sft_collate(items, proc, max_length_text=512, max_length_dna=64)
        trainer.train_step(batch)
        trainer.train_step(batch)
        path = str(tmp_path / "state")
        trainer.save(path)

        trainer2 = SFTTrainer(fusion, cfg, mesh=mesh).restore(path)
        assert trainer2.step == 2
        l1 = trainer.eval_step(batch)
        l2 = trainer2.eval_step(batch)
        np.testing.assert_allclose(l1, l2, rtol=1e-5)
        # training continues identically from the restored optimizer state
        m1 = trainer.train_step(batch)
        m2 = trainer2.train_step(batch)
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-4)
