"""Self-contained BPE loader (data/bpe.py) vs the HF fast-tokenizer stack.

Byte parity on encode + decode over the formats the reference depends on
(Qwen-style Split-regex + ByteLevel, GPT-2-style ByteLevel-with-regex),
including added special tokens and the DNA-token append semantics
(dna_llm.py:67-74).
"""

import json
import os

import pytest

tokenizers = pytest.importorskip("tokenizers")

from bioreason_tpu.data.bpe import (BPETokenizer, UnsupportedTokenizerError,
                                    byte_decoder, byte_encoder)
from bioreason_tpu.data.text_tokenizer import load_hf_tokenizer

# the real Qwen2/Qwen3 pre-tokenizer split pattern
QWEN_SPLIT = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
              r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")

TEXTS = [
    "hello world",
    "Hello, World!  multiple  spaces",
    "line\nbreaks\r\nand\ttabs",
    "unicode: café über 世界 \U0001f9ec",
    "numbers 12345 and mixed a1b2",
    "it's we're I'll they'd",
    "<|im_start|>user\nhi<|im_end|>\n",
    "trailing space ",
    " leading space",
    "",
    "ACGTACGT" * 8,
    "don't stop'",
    "a" * 100,
]


def _vocab_with_merges():
    alphabet = sorted(tokenizers.pre_tokenizers.ByteLevel.alphabet())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    merges = []
    # Ġ is the byte-level mapping of " "
    for a, b in [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                 ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
                 ("a", "b"), ("c", "d"), ("ab", "cd"),
                 ("Ġ", "w"), ("Ġw", "orld"),
                 ("1", "2"), ("12", "3")]:
        if a in vocab and b in vocab:
            merged = a + b
            if merged not in vocab:
                vocab[merged] = len(vocab)
            merges.append((a, b))
    return vocab, merges


def _save_hf(tmp_path, pre_tokenizer, normalizer=None):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from transformers import PreTrainedTokenizerFast

    vocab, merges = _vocab_with_merges()
    raw = Tokenizer(BPE(vocab=vocab, merges=merges))
    raw.pre_tokenizer = pre_tokenizer
    raw.decoder = ByteLevelDecoder()
    if normalizer is not None:
        raw.normalizer = normalizer
    hf = PreTrainedTokenizerFast(tokenizer_object=raw)
    hf.add_special_tokens({"eos_token": "<|im_end|>",
                           "additional_special_tokens": ["<|im_start|>",
                                                         "<|endoftext|>"]})
    path = str(tmp_path)
    hf.save_pretrained(path)
    return path, hf


def _assert_parity(native, hf):
    for text in TEXTS:
        ours = native.encode(text)
        theirs = hf.encode(text, add_special_tokens=False)
        assert ours == theirs, (text, ours, theirs)
        assert native.decode(ours, skip_special_tokens=False) == \
            hf.decode(theirs, skip_special_tokens=False), text
        assert native.decode(ours, skip_special_tokens=True) == \
            hf.decode(theirs, skip_special_tokens=True), text


class TestBPEParity:
    def test_qwen_style_split_regex(self, tmp_path):
        from tokenizers import Regex
        from tokenizers.pre_tokenizers import ByteLevel, Sequence, Split
        pre = Sequence([Split(Regex(QWEN_SPLIT), behavior="isolated"),
                        ByteLevel(add_prefix_space=False, use_regex=False)])
        path, hf = _save_hf(tmp_path, pre)
        native = BPETokenizer.from_dir(path)
        _assert_parity(native, hf)

    def test_gpt2_style_bytelevel_regex(self, tmp_path):
        from tokenizers.pre_tokenizers import ByteLevel
        pre = ByteLevel(add_prefix_space=False, use_regex=True)
        path, hf = _save_hf(tmp_path, pre)
        native = BPETokenizer.from_dir(path)
        _assert_parity(native, hf)

    def test_nfc_normalizer(self, tmp_path):
        from tokenizers.normalizers import NFC
        from tokenizers.pre_tokenizers import ByteLevel
        pre = ByteLevel(add_prefix_space=False, use_regex=True)
        path, hf = _save_hf(tmp_path, pre, normalizer=NFC())
        native = BPETokenizer.from_dir(path)
        # e + combining acute -> NFC composes to é before BPE
        decomposed = "café vs café"
        assert native.encode(decomposed) == hf.encode(decomposed,
                                                      add_special_tokens=False)

    def test_eos_pad_from_config(self, tmp_path):
        from tokenizers.pre_tokenizers import ByteLevel
        path, hf = _save_hf(tmp_path, ByteLevel(add_prefix_space=False))
        native = BPETokenizer.from_dir(path)
        assert native.eos_token == "<|im_end|>"
        assert native.eos_token_id == hf.convert_tokens_to_ids("<|im_end|>")
        assert native.pad_token_id == native.eos_token_id  # dna_llm.py:70


class TestDNATokenAppend:
    def test_load_hf_tokenizer_native_path(self, tmp_path):
        from tokenizers.pre_tokenizers import ByteLevel
        path, hf = _save_hf(tmp_path, ByteLevel(add_prefix_space=False,
                                                use_regex=True))
        native = load_hf_tokenizer(path)              # should pick bpe.py
        assert isinstance(native, BPETokenizer)
        adapter = load_hf_tokenizer(path, prefer_native=False)
        # DNA ids must agree with what transformers assigns (dna_llm.py:72-74)
        assert native.dna_start_id == adapter.dna_start_id
        assert native.dna_pad_id == adapter.dna_pad_id
        assert native.dna_end_id == adapter.dna_end_id
        assert native.vocab_size == adapter.vocab_size
        text = "<|dna_start|><|dna_pad|><|dna_end|> question?"
        assert native.encode(text) == adapter.encode(text)
        ids = native.encode(text)
        assert native.decode(ids) == adapter.decode(ids)
        # batched call shape/padding parity
        b1 = native(["ab", "abcd efgh"], padding_side="left")
        b2 = adapter(["ab", "abcd efgh"], padding_side="left")
        assert (b1["input_ids"] == b2["input_ids"]).all()
        assert (b1["attention_mask"] == b2["attention_mask"]).all()

    def test_guided_token_bytes(self, tmp_path):
        from tokenizers.pre_tokenizers import ByteLevel
        from bioreason_tpu.generate.guided import token_bytes_for
        path, _ = _save_hf(tmp_path, ByteLevel(add_prefix_space=False))
        native = load_hf_tokenizer(path)
        tb = token_bytes_for(native)
        assert tb[native.vocab["a"]] == b"a"
        assert tb[native.vocab["Ġw"]] == b" w"
        assert tb[native.eos_token_id] == b"<|im_end|>"


class TestUnsupportedFallsBack:
    def test_wordpiece_rejected(self, tmp_path):
        spec = {"model": {"type": "WordPiece", "vocab": {}},
                "added_tokens": []}
        p = os.path.join(str(tmp_path), "tokenizer.json")
        with open(p, "w") as f:
            json.dump(spec, f)
        with pytest.raises(UnsupportedTokenizerError):
            BPETokenizer.from_tokenizer_json(p)

    def test_byte_tables_invert(self):
        be, bd = byte_encoder(), byte_decoder()
        assert all(bd[c] == b for b, c in be.items())
        assert len(be) == 256
