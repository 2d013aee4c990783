import numpy as np
import pytest

from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer


class TestKmerTokenizer:
    def test_vocab_layout(self):
        tok = KmerTokenizer()
        assert tok.vocab[:6] == ["<unk>", "<pad>", "<mask>", "<cls>", "<eos>", "<bos>"]
        assert tok.pad_id == 1 and tok.cls_id == 3
        assert tok.vocab_size == 6 + 4096 + 5
        assert tok.token_to_id["AAAAAA"] == 6
        assert tok.token_to_id["N"] == 6 + 4096 + 4

    def test_greedy_longest_match(self):
        tok = KmerTokenizer()
        # 7 chars: one 6-mer + one single char
        assert tok.tokenize("ACGTACG") == ["ACGTAC", "G"]
        # N breaks the 6-mer frame; greedy restarts right after it
        toks = tok.tokenize("ACNACGTACG")
        assert toks[0:3] == ["A", "C", "N"]
        assert toks[3] == "ACGTAC"

    def test_encode_prepends_cls(self):
        tok = KmerTokenizer()
        ids = tok.encode("ACGTAC")
        assert ids[0] == tok.cls_id and len(ids) == 2

    def test_batch_right_pad(self):
        tok = KmerTokenizer()
        out = tok(["ACGTACGTACGT", "ACGTAC"], max_length=16)
        ids, mask = out["input_ids"], out["attention_mask"]
        assert ids.shape == (2, 3)
        assert mask.tolist() == [[1, 1, 1], [1, 1, 0]]
        assert ids[1, 2] == tok.pad_id

    def test_truncation_includes_cls(self):
        tok = KmerTokenizer()
        out = tok(["ACGTACGTACGTACGTAC"], max_length=2)
        assert out["input_ids"].shape[1] == 2
        assert out["input_ids"][0, 0] == tok.cls_id

    def test_decode_roundtrip(self):
        tok = KmerTokenizer()
        s = "ACGTACGTACGTN"
        assert tok.decode(tok.encode(s)) == s


class TestCharDNATokenizer:
    def test_ids_are_bytes(self):
        tok = CharDNATokenizer()
        assert tok.encode("ACGT") == [65, 67, 71, 84]
        assert tok.decode([65, 67, 71, 84]) == "ACGT"

    def test_left_padding(self):
        tok = CharDNATokenizer()
        out = tok(["ACGT", "AC"])
        assert out["input_ids"][1].tolist() == [1, 1, 65, 67]
        assert out["attention_mask"][1].tolist() == [0, 0, 1, 1]

    def test_pad_id_is_one(self):
        assert CharDNATokenizer().pad_id == 1


class TestByteTextTokenizer:
    def test_atomic_specials(self):
        tok = ByteTextTokenizer()
        ids = tok.encode("<|im_start|>user\nhi<|im_end|>")
        assert ids[0] == tok.token_to_id["<|im_start|>"]
        assert ids[-1] == tok.token_to_id["<|im_end|>"]
        assert tok.decode(ids, skip_special_tokens=False) == "<|im_start|>user\nhi<|im_end|>"

    def test_skip_special_keeps_think(self):
        tok = ByteTextTokenizer()
        text = "<think>\nreason\n</think>\n\nAnswer: x<|im_end|>"
        out = tok.decode(tok.encode(text), skip_special_tokens=True)
        assert "</think>" in out and "<|im_end|>" not in out

    def test_pad_is_eos_is_im_end(self):
        tok = ByteTextTokenizer()
        assert tok.pad_token_id == tok.eos_token_id == tok.token_to_id["<|im_end|>"]

    def test_batch_left_pad(self):
        tok = ByteTextTokenizer()
        out = tok(["abcd", "ab"], padding_side="left")
        assert out["input_ids"][1, :2].tolist() == [tok.pad_token_id] * 2
        assert out["attention_mask"][1].tolist() == [0, 0, 1, 1]

    def test_unicode_roundtrip(self):
        tok = ByteTextTokenizer()
        s = "géne ω <|dna_pad|> end"
        assert tok.decode(tok.encode(s), skip_special_tokens=False) == s
