"""End-to-end pretrained-weight path: local HF dirs -> configs -> params ->
training/generation (reference constructor behavior, dna_llm.py:64-101).

Builds tiny but REAL HF checkpoints on disk (Qwen3ForCausalLM with a working
fast tokenizer; rotary EsmForMaskedLM with an NT-layout vocab.txt), loads
them through utils/pretrained, and drives a few SFT steps + a generation.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _make_qwen3_dir(path):
    """Tiny Qwen3 checkpoint + byte-level fast tokenizer. The model vocab is
    PADDED past len(tokenizer) like real Qwen3 (151936 vs 151669), which is
    what lets the 3 DNA special tokens fit without resizing."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from transformers import PreTrainedTokenizerFast, Qwen3Config, Qwen3ForCausalLM

    alphabet = sorted(ByteLevel.alphabet())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    raw = Tokenizer(BPE(vocab=vocab, merges=[]))
    raw.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=False)
    raw.decoder = ByteLevelDecoder()
    tok = PreTrainedTokenizerFast(tokenizer_object=raw)
    tok.add_special_tokens({"eos_token": "<|im_end|>",
                            "additional_special_tokens": ["<|im_start|>", "<|endoftext|>"]})
    tok.save_pretrained(path)
    n_tok = len(tok)                                     # 259
    torch.manual_seed(0)
    cfg = Qwen3Config(vocab_size=n_tok + 8,              # padded slack
                      hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8,
                      max_position_embeddings=2048, rope_theta=10000.0,
                      rms_norm_eps=1e-6, tie_word_embeddings=True,
                      torch_dtype=torch.float32)
    Qwen3ForCausalLM(cfg).save_pretrained(path)
    return n_tok


def _make_esm_dir(path):
    """Tiny rotary ESM checkpoint with a single-nucleotide NT-layout vocab
    (specials in KmerTokenizer order: unk/pad/mask/cls/eos/bos, pad id 1)."""
    from transformers import EsmConfig, EsmForMaskedLM
    vocab = ["<unk>", "<pad>", "<mask>", "<cls>", "<eos>", "<bos>",
             "A", "C", "G", "T", "N"]
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    torch.manual_seed(1)
    cfg = EsmConfig(vocab_size=len(vocab), hidden_size=24, intermediate_size=48,
                    num_hidden_layers=2, num_attention_heads=4,
                    position_embedding_type="rotary", token_dropout=False,
                    emb_layer_norm_before=False, layer_norm_eps=1e-12,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                    max_position_embeddings=512, pad_token_id=1, mask_token_id=2)
    EsmForMaskedLM(cfg).save_pretrained(path)
    return len(vocab)


@pytest.fixture(scope="module")
def hf_dirs(tmp_path_factory):
    qwen_dir = str(tmp_path_factory.mktemp("hf_qwen3_full"))
    esm_dir = str(tmp_path_factory.mktemp("hf_esm_full"))
    _make_qwen3_dir(qwen_dir)
    _make_esm_dir(esm_dir)
    return qwen_dir, esm_dir


class TestPretrainedFusion:
    def test_load_and_configs(self, hf_dirs):
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        qwen_dir, esm_dir = hf_dirs
        cfg, params, tok, dna_tok = load_pretrained_fusion(
            qwen_dir, esm_dir, max_length_text=64, max_length_dna=32)
        # DNA special tokens landed in the padded vocab slack, no resize
        assert tok.dna_pad_id < cfg.decoder.vocab_size
        assert cfg.dna_pad_token_id == tok.dna_pad_id
        assert params["decoder"]["embed"]["embedding"].shape == (
            cfg.decoder.vocab_size, cfg.decoder.hidden_size)
        assert params["encoder"]["embed"]["embedding"].shape == (
            cfg.encoder.vocab_size, cfg.encoder.hidden_size)
        assert dna_tok.pad_id == 1
        # imported encoder carries the HF biases
        assert "bias" in params["encoder"]["layers"]["attn"]["q"]

    def test_decoder_matches_hf_after_load(self, hf_dirs):
        """The assembled fusion decoder reproduces HF logits (the golden
        checks of test_golden_parity.py hold through load_pretrained_fusion)."""
        from transformers import AutoModelForCausalLM
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        from bioreason_tpu.models.qwen3 import decoder_forward
        import dataclasses
        qwen_dir, esm_dir = hf_dirs
        cfg, params, tok, _ = load_pretrained_fusion(
            qwen_dir, esm_dir, max_length_text=64, max_length_dna=32)
        dec_cfg = dataclasses.replace(cfg.decoder, dtype="float32",
                                      attention_impl="xla", remat=False)
        model = AutoModelForCausalLM.from_pretrained(qwen_dir).eval()
        ids = np.asarray([tok.encode("the quick brown fox")], np.int32)
        with torch.no_grad():
            hf = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        with jax.default_matmul_precision("highest"):
            logits, _ = decoder_forward(params["decoder"], dec_cfg,
                                        input_ids=jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(logits), hf, atol=1e-4, rtol=1e-4)

    def test_sft_steps_and_generation(self, hf_dirs):
        """A few SFT steps on the pretrained towers: finite decreasing loss,
        then a generation through the engine (the reference's smoke:
        train a bit, sample — train_dna_qwen.py:217-328)."""
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        from bioreason_tpu.config import LoRAConfig, OptimConfig, SFTConfig
        from bioreason_tpu.data import BioProcessor
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import synthetic_kegg_items, format_kegg_for_dna_llm
        from bioreason_tpu.generate import GenerationEngine
        from bioreason_tpu.train.sft import SFTTrainer

        qwen_dir, esm_dir = hf_dirs
        # byte-level vocab: the rendered chat is ~700 tokens, so the text
        # budget must cover it or the assistant span is truncated away
        cfg, params, tok, dna_tok = load_pretrained_fusion(
            qwen_dir, esm_dir, max_length_text=1024, max_length_dna=32)
        proc = BioProcessor(tok, dna_tok)
        items = [format_kegg_for_dna_llm(x)
                 for x in synthetic_kegg_items(4, seq_len=24, seed=0)]
        batch = sft_collate(items, proc, max_length_text=1024, max_length_dna=32,
                            bucket=32)
        assert (batch["labels"] != -100).sum() > 0
        sft_cfg = SFTConfig(batch_size=4, max_length_text=1024, max_length_dna=32,
                            optim=OptimConfig(learning_rate=1e-3, total_steps=6),
                            lora=LoRAConfig(r=4, alpha=8, dropout=0.0))
        trainer = SFTTrainer(cfg, sft_cfg, params=params)
        losses = [trainer.train_step(batch)["loss"] for _ in range(6)]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

        engine = GenerationEngine(cfg, eos_token_id=tok.eos_token_id)
        pout = proc(text=["<|im_start|>user\n<|dna_start|><|dna_pad|><|dna_end|> ok"
                          "<|im_end|>\n<|im_start|>assistant\n"],
                    batch_dna_sequences=[["ACGTACGT"]],
                    max_length_text=64, max_length_dna=32)
        gen_ids, gen_mask = engine.generate(
            trainer.params, pout.input_ids, pout.attention_mask,
            pout.dna_input_ids, pout.dna_attention_mask, max_new_tokens=8)
        assert gen_ids.shape[1] == 8
        text = tok.decode(gen_ids[0][gen_mask[0].astype(bool)])
        assert isinstance(text, str)

    def test_rejects_absolute_position_esm(self, tmp_path):
        from bioreason_tpu.utils.pretrained import encoder_config_from_hf
        with open(tmp_path / "config.json", "w") as f:
            json.dump({"vocab_size": 11, "hidden_size": 24,
                       "intermediate_size": 48, "num_hidden_layers": 2,
                       "num_attention_heads": 4,
                       "position_embedding_type": "absolute"}, f)
        with pytest.raises(ValueError, match="rotary"):
            encoder_config_from_hf(str(tmp_path))

    def test_rejects_non_qwen3(self, tmp_path):
        from bioreason_tpu.utils.pretrained import decoder_config_from_hf
        with open(tmp_path / "config.json", "w") as f:
            json.dump({"architectures": ["LlamaForCausalLM"],
                       "model_type": "llama", "vocab_size": 100,
                       "hidden_size": 8, "intermediate_size": 16,
                       "num_hidden_layers": 1, "num_attention_heads": 2}, f)
        with pytest.raises(ValueError, match="Qwen3"):
            decoder_config_from_hf(str(tmp_path))
