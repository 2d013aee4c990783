r"""Self-contained byte-level BPE tokenizer (HF `tokenizer.json` loader).

The reference's text tokenizer is the HF Qwen fast tokenizer
(/root/reference/bioreason/models/dna_llm.py:67-74). This module loads the
same on-disk format (`tokenizer.json`: BPE vocab/merges + pre-tokenizer +
added tokens) with NO dependency on `transformers`/`tokenizers`, so the
framework's pretrained path is standalone. `text_tokenizer.load_hf_tokenizer`
tries this loader first and falls back to the transformers adapter only for
exotic tokenizer configurations it cannot represent.

Supported tokenizer.json features (everything Qwen2/Qwen3 and GPT-2-family
tokenizers use):
  * model.type == "BPE" with vocab + merges (string or pair form);
  * normalizer: none or NFC/NFKC/NFD/NFKD;
  * pre_tokenizer: ByteLevel (with/without its built-in GPT-2 regex,
    add_prefix_space), Split(Regex, behavior=Isolated/Removed), or a
    Sequence of those — the tiktoken-style split regexes use \p{L}/\p{N}
    unicode classes, handled via the `regex` module;
  * added_tokens with `special` flags (split before normalization, like HF).

Anything else raises `UnsupportedTokenizerError` so callers can fall back.
"""

from __future__ import annotations

import functools
import json
import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

# tiktoken/GPT-2 default byte-level split pattern (used when a ByteLevel
# pre-tokenizer has use_regex=true)
GPT2_SPLIT = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"
              r" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


class UnsupportedTokenizerError(ValueError):
    pass


@functools.lru_cache(maxsize=1)
def byte_encoder() -> Dict[int, str]:
    """GPT-2 bytes->unicode alphabet (the printable stand-ins BPE runs on)."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@functools.lru_cache(maxsize=1)
def byte_decoder() -> Dict[str, int]:
    return {c: b for b, c in byte_encoder().items()}


class _PreTokenizer:
    """Composed split pipeline from the tokenizer.json pre_tokenizer spec."""

    def __init__(self, spec: Optional[dict]):
        import regex
        self.steps: List[Tuple[object, str]] = []   # (compiled, behavior)
        self.add_prefix_space = False
        for sub in self._flatten(spec):
            t = sub.get("type")
            if t == "ByteLevel":
                self.add_prefix_space = bool(sub.get("add_prefix_space", True))
                if sub.get("use_regex", True):
                    self.steps.append((regex.compile(GPT2_SPLIT), "isolated"))
                # byte mapping itself happens during BPE encoding
            elif t == "Split":
                pat = sub.get("pattern", {})
                if "Regex" in pat:
                    compiled = regex.compile(pat["Regex"])
                elif "String" in pat:
                    compiled = regex.compile(regex.escape(pat["String"]))
                else:
                    raise UnsupportedTokenizerError(f"Split pattern {pat}")
                behavior = sub.get("behavior", "Isolated").lower()
                if behavior not in ("isolated", "removed"):
                    raise UnsupportedTokenizerError(f"Split behavior {behavior}")
                if sub.get("invert"):
                    raise UnsupportedTokenizerError("Split invert=true")
                self.steps.append((compiled, behavior))
            else:
                raise UnsupportedTokenizerError(f"pre_tokenizer {t}")

    @staticmethod
    def _flatten(spec: Optional[dict]) -> List[dict]:
        if spec is None:
            return []
        if spec.get("type") == "Sequence":
            out = []
            for sub in spec.get("pretokenizers", []):
                out.extend(_PreTokenizer._flatten(sub))
            return out
        return [spec]

    def split(self, text: str) -> List[str]:
        if self.add_prefix_space and text and not text.startswith(" "):
            text = " " + text
        pieces = [text]
        for compiled, behavior in self.steps:
            nxt: List[str] = []
            for piece in pieces:
                pos = 0
                for m in compiled.finditer(piece):
                    if m.start() > pos:
                        nxt.append(piece[pos:m.start()])
                    if behavior == "isolated" and m.group():
                        nxt.append(m.group())
                    pos = m.end()
                if pos < len(piece):
                    nxt.append(piece[pos:])
            pieces = nxt
        return [p for p in pieces if p]


class BPETokenizer:
    """Byte-level BPE with the ByteTextTokenizer duck-typed interface.

    Construct via `BPETokenizer.from_dir(path)` (a directory holding HF
    `tokenizer.json` [+ optional `tokenizer_config.json`]) or
    `from_tokenizer_json(file)`."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 pre_tokenizer: Optional[dict] = None,
                 normalizer: Optional[dict] = None,
                 added_tokens: Sequence[dict] = (),
                 eos_token: Optional[str] = None,
                 pad_token: Optional[str] = None):
        import regex
        self.vocab = dict(vocab)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.pre = _PreTokenizer(pre_tokenizer)
        self.normalizer = self._check_normalizer(normalizer)
        self._be = byte_encoder()
        self._bd = byte_decoder()
        self._bpe_cache: Dict[str, List[str]] = {}

        # added tokens: split before normalization, own ids, special flag
        self.added: Dict[str, int] = {}
        self._special_ids: set = set()
        next_id = (max(self.vocab.values()) + 1) if self.vocab else 0
        for at in added_tokens:
            content, tid = at["content"], at.get("id")
            if tid is None:
                tid = next_id
            self.added[content] = tid
            next_id = max(next_id, tid + 1)
            if at.get("special"):
                self._special_ids.add(tid)
        self._rebuild_added_regex(regex)

        self.id_to_token: Dict[int, str] = {v: k for k, v in self.vocab.items()}
        self.id_to_added: Dict[int, str] = {v: k for k, v in self.added.items()}

        all_tokens = {**self.vocab, **self.added}
        self.eos_token = eos_token or next(
            (t for t in ("<|im_end|>", "<|endoftext|>", "</s>") if t in all_tokens),
            None)
        if self.eos_token is None:
            raise UnsupportedTokenizerError("no eos token found")
        self.eos_token_id = all_tokens[self.eos_token]
        # reference sets pad = eos (dna_llm.py:70)
        self.pad_token = pad_token or self.eos_token
        self.pad_token_id = all_tokens[self.pad_token]

    # -- construction ------------------------------------------------------

    @classmethod
    def from_tokenizer_json(cls, path: str, **kw) -> "BPETokenizer":
        with open(path) as f:
            spec = json.load(f)
        model = spec.get("model", {})
        if model.get("type") != "BPE":
            raise UnsupportedTokenizerError(f"model type {model.get('type')}")
        for field in ("continuing_subword_prefix", "end_of_word_suffix"):
            if model.get(field):
                raise UnsupportedTokenizerError(f"BPE {field}")
        merges = [tuple(m) if isinstance(m, list) else tuple(m.split(" ", 1))
                  for m in model.get("merges", [])]
        return cls(vocab=model.get("vocab", {}), merges=merges,
                   pre_tokenizer=spec.get("pre_tokenizer"),
                   normalizer=spec.get("normalizer"),
                   added_tokens=spec.get("added_tokens", []), **kw)

    @classmethod
    def from_dir(cls, path: str) -> "BPETokenizer":
        tj = os.path.join(path, "tokenizer.json")
        if not os.path.exists(tj):
            raise UnsupportedTokenizerError(f"no tokenizer.json in {path}")
        eos = pad = None
        cfg_path = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            eos = _token_content(cfg.get("eos_token"))
            pad = _token_content(cfg.get("pad_token"))
        return cls.from_tokenizer_json(tj, eos_token=eos, pad_token=pad)

    @staticmethod
    def _check_normalizer(spec: Optional[dict]):
        if spec is None:
            return None
        forms = {"NFC", "NFKC", "NFD", "NFKD"}
        if spec.get("type") in forms:
            return spec["type"]
        raise UnsupportedTokenizerError(f"normalizer {spec.get('type')}")

    def _rebuild_added_regex(self, regex_mod=None):
        import regex
        if self.added:
            pat = "|".join(regex.escape(t) for t in
                           sorted(self.added, key=len, reverse=True))
            self._added_re = regex.compile(f"({pat})")
        else:
            self._added_re = None

    # -- special-token management ------------------------------------------

    def add_special_tokens(self, tokens: Iterable[str]) -> int:
        """Append new special tokens (HF add_special_tokens semantics: new
        ids continue after the current max id). Returns number added."""
        n = 0
        next_id = max(list(self.vocab.values()) + list(self.added.values())) + 1
        for t in tokens:
            if t in self.added or t in self.vocab:
                continue
            self.added[t] = next_id
            self.id_to_added[next_id] = t
            self._special_ids.add(next_id)
            next_id += 1
            n += 1
        if n:
            self._rebuild_added_regex()
        return n

    # -- core BPE ------------------------------------------------------------

    def _bpe(self, piece: str) -> List[str]:
        """piece: unicode-alphabet string (bytes already mapped)."""
        cached = self._bpe_cache.get(piece)
        if cached is not None:
            return cached
        word = list(piece)
        while len(word) > 1:
            best_rank, best_pair = None, None
            for pair in zip(word, word[1:]):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            merged, i = [], 0
            a, b = best_pair
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._bpe_cache[piece] = word
        return word

    def _encode_segment(self, text: str) -> List[int]:
        if self.normalizer:
            text = unicodedata.normalize(self.normalizer, text)
        ids: List[int] = []
        for pre in self.pre.split(text):
            mapped = "".join(self._be[b] for b in pre.encode("utf-8"))
            for piece in self._bpe(mapped):
                tid = self.vocab.get(piece)
                if tid is not None:
                    ids.append(tid)
                else:                      # degenerate vocab: per-char fallback
                    ids.extend(self.vocab[c] for c in piece if c in self.vocab)
        return ids

    # -- public interface (ByteTextTokenizer-compatible) ---------------------

    @property
    def vocab_size(self) -> int:
        # HF len(tokenizer) semantics: distinct ids across vocab + added
        return len(set(self.vocab.values()) | set(self.added.values()))

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        if self._added_re is None:
            return self._encode_segment(text)
        ids: List[int] = []
        for part in self._added_re.split(text):
            if not part:
                continue
            tid = self.added.get(part)
            if tid is not None:
                ids.append(tid)
            else:
                ids.extend(self._encode_segment(part))
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out: List[str] = []
        buf = bytearray()

        def flush():
            if buf:
                out.append(buf.decode("utf-8", errors="replace"))
                buf.clear()

        for i in ids:
            i = int(i)
            added = self.id_to_added.get(i)
            if added is not None:
                flush()
                if skip_special_tokens and i in self._special_ids:
                    continue
                out.append(added)
                continue
            tok = self.id_to_token.get(i)
            if tok is None:
                continue
            if skip_special_tokens and i in self._special_ids:
                flush()
                continue
            for c in tok:
                b = self._bd.get(c)
                if b is None:            # non-byte-alphabet char (rare)
                    flush()
                    out.append(c)
                else:
                    buf.append(b)
        flush()
        return "".join(out)

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch]

    def convert_tokens_to_ids(self, token: str):
        if token in self.added:
            return self.added[token]
        return self.vocab.get(token)

    def convert_ids_to_tokens(self, i: int) -> Optional[str]:
        return self.id_to_token.get(i) or self.id_to_added.get(i)

    def __call__(self, texts, max_length: Optional[int] = None, padding: bool = True,
                 truncation: bool = True, padding_side: str = "left",
                 pad_to: Optional[int] = None, add_special_tokens: bool = False):
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t) for t in texts]
        if truncation and max_length is not None:
            encoded = [e[:max_length] for e in encoded]
        if not padding:
            return {"input_ids": encoded,
                    "attention_mask": [[1] * len(e) for e in encoded]}
        width = pad_to if pad_to is not None else (
            max(len(e) for e in encoded) if encoded else 0)
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


def _token_content(t) -> Optional[str]:
    if t is None:
        return None
    if isinstance(t, dict):
        return t.get("content")
    return str(t)
