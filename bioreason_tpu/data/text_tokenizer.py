"""Text tokenizers for the LLM tower.

The reference uses the HF Qwen tokenizer with three extra special tokens
appended (`<|dna_start|>`, `<|dna_pad|>`, `<|dna_end|>` — reference:
bioreason/models/dna_llm.py:72-74) and `pad_token = eos_token` (:70).

This module provides:

* `ByteTextTokenizer` — a self-contained byte-level tokenizer with the same
  special-token surface as Qwen3 (+DNA tokens). Token id == byte value for
  0..255; atomic tokens occupy ids 256+. It is the default for tests, benches
  and training-from-scratch, because pretrained Qwen vocab files cannot be
  assumed present.
* `load_hf_tokenizer` — adapter that wraps a real HF tokenizer directory
  (tokenizer.json) when the user has Qwen assets on disk, adding the DNA
  special tokens exactly like the reference.

Both expose the same small interface used throughout the framework:
`encode`, `decode`, `batch_decode`, `__call__` (batched numpy), `token_to_id`,
and the special-token ids.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

# Atomic tokens. `special=True` tokens are removed by skip_special_tokens
# decoding; <think>/</think> are atomic but NOT special (Qwen3 keeps them in
# decoded text, which GRPO reward parsing depends on — reference reason.py:117-121).
SPECIAL_TOKENS: List[str] = [
    "<|endoftext|>", "<|im_start|>", "<|im_end|>",
    "<|dna_start|>", "<|dna_pad|>", "<|dna_end|>",
]
ATOMIC_NONSPECIAL_TOKENS: List[str] = ["<think>", "</think>", "<tool_call>", "</tool_call>"]


class ByteTextTokenizer:
    """Byte-level tokenizer with Qwen3-style special tokens.

    ids 0..255   : raw bytes
    ids 256..    : SPECIAL_TOKENS + ATOMIC_NONSPECIAL_TOKENS in order
    """

    def __init__(self):
        self._atomic = SPECIAL_TOKENS + ATOMIC_NONSPECIAL_TOKENS
        self.token_to_id: Dict[str, int] = {t: 256 + i for i, t in enumerate(self._atomic)}
        self._id_to_token = {v: k for k, v in self.token_to_id.items()}
        self._special_ids = {self.token_to_id[t] for t in SPECIAL_TOKENS}
        pat = "|".join(re.escape(t) for t in sorted(self._atomic, key=len, reverse=True))
        self._split_re = re.compile(f"({pat})")

        self.eos_token = "<|im_end|>"          # Qwen3 chat eos
        self.eos_token_id = self.token_to_id[self.eos_token]
        # Reference sets pad = eos (dna_llm.py:70)
        self.pad_token = self.eos_token
        self.pad_token_id = self.eos_token_id
        self.dna_start_id = self.token_to_id["<|dna_start|>"]
        self.dna_pad_id = self.token_to_id["<|dna_pad|>"]
        self.dna_end_id = self.token_to_id["<|dna_end|>"]

    @property
    def vocab_size(self) -> int:
        return 256 + len(self._atomic)

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids: List[int] = []
        for part in self._split_re.split(text):
            if not part:
                continue
            if part in self.token_to_id:
                ids.append(self.token_to_id[part])
            else:
                ids.extend(part.encode("utf-8"))
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        out: List[str] = []
        buf = bytearray()
        for i in ids:
            i = int(i)
            if i >= 256:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                if skip_special_tokens and i in self._special_ids:
                    continue
                out.append(self._id_to_token.get(i, ""))
            else:
                buf.append(i)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch]

    def convert_tokens_to_ids(self, token: str) -> int:
        return self.token_to_id[token]

    def __call__(self, texts, max_length: Optional[int] = None, padding: bool = True,
                 truncation: bool = True, padding_side: str = "left",
                 pad_to: Optional[int] = None, add_special_tokens: bool = False):
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t) for t in texts]
        if truncation and max_length is not None:
            encoded = [e[:max_length] for e in encoded]
        if not padding:
            return {"input_ids": encoded, "attention_mask": [[1] * len(e) for e in encoded]}
        width = pad_to if pad_to is not None else (max(len(e) for e in encoded) if encoded else 0)
        n = len(encoded)
        input_ids = np.full((n, width), self.pad_token_id, dtype=np.int32)
        attention_mask = np.zeros((n, width), dtype=np.int32)
        for r, e in enumerate(encoded):
            e = e[:width]
            if padding_side == "left":
                input_ids[r, width - len(e):] = e
                attention_mask[r, width - len(e):] = 1
            else:
                input_ids[r, :len(e)] = e
                attention_mask[r, :len(e)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


DNA_SPECIAL_TOKENS = ["<|dna_start|>", "<|dna_pad|>", "<|dna_end|>"]


def load_hf_tokenizer(path: str, prefer_native: bool = True):
    """Load a local HF fast-tokenizer directory (e.g. a Qwen3 download) with
    the DNA special tokens added, mirroring reference dna_llm.py:67-74.

    Tries the self-contained byte-level BPE loader first (data/bpe.py — no
    transformers/tokenizers dependency); falls back to the transformers
    adapter only for tokenizer.json features the native loader does not
    support. No network access is attempted either way."""
    if prefer_native:
        from bioreason_tpu.data.bpe import BPETokenizer, UnsupportedTokenizerError
        try:
            tok = BPETokenizer.from_dir(path)
        except UnsupportedTokenizerError:
            tok = None
        if tok is not None:
            tok.add_special_tokens(DNA_SPECIAL_TOKENS)
            tok.dna_start_id = tok.convert_tokens_to_ids("<|dna_start|>")
            tok.dna_pad_id = tok.convert_tokens_to_ids("<|dna_pad|>")
            tok.dna_end_id = tok.convert_tokens_to_ids("<|dna_end|>")
            return tok

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path, trust_remote_code=False, local_files_only=True)
    tok.add_special_tokens({"additional_special_tokens": DNA_SPECIAL_TOKENS})
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    return HFTokenizerAdapter(tok)


class HFTokenizerAdapter:
    """Duck-types the ByteTextTokenizer interface over an HF tokenizer."""

    def __init__(self, tok):
        self.tok = tok
        self.eos_token = tok.eos_token
        self.eos_token_id = tok.eos_token_id
        self.pad_token = tok.pad_token or tok.eos_token
        self.pad_token_id = tok.pad_token_id if tok.pad_token_id is not None else tok.eos_token_id
        self.dna_start_id = tok.convert_tokens_to_ids("<|dna_start|>")
        self.dna_pad_id = tok.convert_tokens_to_ids("<|dna_pad|>")
        self.dna_end_id = tok.convert_tokens_to_ids("<|dna_end|>")

    @property
    def vocab_size(self) -> int:
        return len(self.tok)

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        return self.tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(list(map(int, ids)), skip_special_tokens=skip_special_tokens)

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        return [self.decode(ids, skip_special_tokens) for ids in batch]

    def convert_tokens_to_ids(self, token: str) -> int:
        return self.tok.convert_tokens_to_ids(token)

    def __call__(self, texts, max_length=None, padding=True, truncation=True,
                 padding_side="left", pad_to=None, add_special_tokens=False):
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t, add_special_tokens=add_special_tokens) for t in texts]
        if truncation and max_length is not None:
            encoded = [e[:max_length] for e in encoded]
        if not padding:
            return {"input_ids": encoded, "attention_mask": [[1] * len(e) for e in encoded]}
        width = pad_to if pad_to is not None else (max(len(e) for e in encoded) if encoded else 0)
        n = len(encoded)
        input_ids = np.full((n, width), self.pad_token_id, dtype=np.int32)
        attention_mask = np.zeros((n, width), dtype=np.int32)
        for r, e in enumerate(encoded):
            e = e[:width]
            if padding_side == "left":
                input_ids[r, width - len(e):] = e
                attention_mask[r, width - len(e):] = 1
            else:
                input_ids[r, :len(e)] = e
                attention_mask[r, :len(e)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}
