"""User-facing model API: OO wrappers over the functional core.

Mirrors the reference's public surface (`DNALLMModel`, dna_llm.py:18-305;
`DNAClassifierModel`, dna_only.py:42-203) so reference users can migrate with
minimal code changes, while everything underneath stays pure-functional and
jit/pjit-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from bioreason_tpu.config import (DecoderConfig, EncoderConfig, FusionConfig,
                                  HyenaConfig, SamplingConfig)
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
from bioreason_tpu.data.processor import BioProcessor
from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer
from bioreason_tpu.models.classifier import classifier_forward, init_classifier
from bioreason_tpu.models.fusion import (fusion_forward, init_fusion,
                                         validate_splice)


class DnaLLM:
    """DNA-encoder + LLM fusion model (reference `DNALLMModel`).

    Usage:
        model = DnaLLM(FusionConfig(...))            # or .tiny() for tests
        batch = model.prepare_inputs(texts, batch_dna_sequences)
        logits, loss = model(params_or_none, **batch, labels=labels)
        completions = model.generate_text(prompts, batch_dna_sequences)
    """

    def __init__(self, cfg: Optional[FusionConfig] = None,
                 text_tokenizer=None, dna_tokenizer=None,
                 params: Optional[Dict] = None, seed: int = 0):
        self.text_tokenizer = text_tokenizer or ByteTextTokenizer()
        if dna_tokenizer is None:
            dna_tokenizer = (CharDNATokenizer() if (cfg and cfg.encoder_kind == "evo2")
                             else KmerTokenizer())
        self.dna_tokenizer = dna_tokenizer
        if cfg is None:
            cfg = FusionConfig(dna_pad_token_id=self.text_tokenizer.dna_pad_id)
        self.cfg = cfg
        self.processor = BioProcessor(self.text_tokenizer, self.dna_tokenizer)
        self.params = params if params is not None else init_fusion(
            jax.random.PRNGKey(seed), cfg)
        # lazy import: generate.engine imports models.fusion, so a top-level
        # import here would make the models package init circular
        from bioreason_tpu.generate.engine import GenerationEngine
        self.engine = GenerationEngine(cfg, eos_token_id=self.text_tokenizer.eos_token_id)

    # -- data ---------------------------------------------------------------

    def prepare_inputs(self, texts: Sequence[str],
                       batch_dna_sequences: Optional[Sequence[Sequence[str]]] = None,
                       **kw) -> Dict[str, Any]:
        out = self.processor(
            text=list(texts), batch_dna_sequences=batch_dna_sequences,
            max_length_text=self.cfg.max_length_text,
            max_length_dna=self.cfg.max_length_dna, **kw)
        validate_splice(out.input_ids, out.dna_input_ids, self.cfg.dna_pad_token_id)
        return {"input_ids": out.input_ids, "attention_mask": out.attention_mask,
                "dna_input_ids": out.dna_input_ids,
                "dna_attention_mask": out.dna_attention_mask}

    # -- compute ------------------------------------------------------------

    def __call__(self, input_ids, attention_mask, dna_input_ids=None,
                 dna_attention_mask=None, labels=None, params=None):
        return fusion_forward(params if params is not None else self.params,
                              self.cfg, input_ids, attention_mask,
                              dna_input_ids, dna_attention_mask, labels=labels)

    forward = __call__

    def generate(self, input_ids, attention_mask, dna_input_ids=None,
                 dna_attention_mask=None, sampling: SamplingConfig = SamplingConfig(),
                 max_new_tokens: Optional[int] = None, greedy: bool = False,
                 rng=None, params=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns COMPLETION ids only, like the reference generate path
        (dna_llm.py:298-305)."""
        return self.engine.generate(
            params if params is not None else self.params,
            input_ids, attention_mask, dna_input_ids, dna_attention_mask,
            sampling=sampling, max_new_tokens=max_new_tokens, greedy=greedy, rng=rng)

    def generate_text(self, texts: Sequence[str],
                      batch_dna_sequences: Optional[Sequence[Sequence[str]]] = None,
                      skip_special_tokens: bool = True, **kw) -> List[str]:
        batch = self.prepare_inputs(texts, batch_dna_sequences)
        ids, mask = self.generate(**batch, **kw)
        return self.text_tokenizer.batch_decode(
            [row[m.astype(bool)] for row, m in zip(ids, mask)],
            skip_special_tokens=skip_special_tokens)

    # -- persistence --------------------------------------------------------

    def save(self, path: str, step: int = 0, stage: str = "sft"):
        from bioreason_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(path, self.params, step=step, stage=stage)

    def load(self, path: str):
        from bioreason_tpu.train.checkpoint import load_checkpoint
        self.params = load_checkpoint(path, like=self.params)
        return self


class DNAClassifier:
    """DNA-only classifier (reference `DNAClassifierModel`)."""

    def __init__(self, cfg: Optional[EncoderConfig] = None, num_classes: int = 2,
                 dna_tokenizer=None, params: Optional[Dict] = None, seed: int = 0):
        self.cfg = cfg or EncoderConfig()
        self.num_classes = num_classes
        self.dna_tokenizer = dna_tokenizer or KmerTokenizer()
        self.params = params if params is not None else init_classifier(
            jax.random.PRNGKey(seed), self.cfg, num_classes)

    def __call__(self, ref_ids, alt_ids, ref_attention_mask, alt_attention_mask,
                 params=None):
        return classifier_forward(params if params is not None else self.params,
                                  self.cfg, ref_ids, alt_ids,
                                  ref_attention_mask, alt_attention_mask)

    def predict(self, ref_sequences: Sequence[str], alt_sequences: Sequence[str],
                max_length: int = 2048) -> np.ndarray:
        t_ref = self.dna_tokenizer(list(ref_sequences), max_length=max_length)
        t_alt = self.dna_tokenizer(list(alt_sequences), max_length=max_length,
                                   pad_to=t_ref["input_ids"].shape[1])
        # pad ref to alt width too if alt came out wider
        if t_alt["input_ids"].shape[1] > t_ref["input_ids"].shape[1]:
            t_ref = self.dna_tokenizer(list(ref_sequences), max_length=max_length,
                                       pad_to=t_alt["input_ids"].shape[1])
        logits = self(t_ref["input_ids"], t_alt["input_ids"],
                      t_ref["attention_mask"], t_alt["attention_mask"])
        return np.argmax(np.asarray(logits), axis=-1)
