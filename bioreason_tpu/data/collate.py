"""Batch collators.

`sft_collate` rebuilds the reference `qwen_dna_collate_fn`
(bioreason/dataset/kegg.py:223-333): render chat -> bi-modal processor with
left padding -> labels = -100 everywhere except assistant spans, found by
scanning token-level `<|im_start|>assistant\n` / `<|im_end|>` markers; pad
tokens are re-masked afterwards (which, since pad == <|im_end|> id, also masks
every end marker — a reference behavior we keep for parity).

`classifier_collate` rebuilds `dna_collate_fn` (kegg.py:336-382): ref and alt
sequences tokenized separately + integer labels.

TPU addition: optional `bucket` rounds padded widths up to a multiple (128 by
default in training configs) so XLA sees a small, stable set of shapes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from bioreason_tpu.data.chat_template import apply_chat_template
from bioreason_tpu.data.processor import BioProcessor

IGNORE_INDEX = -100


def _find_subsequence(row: np.ndarray, pattern: np.ndarray) -> List[int]:
    """Start indices of all occurrences of `pattern` in 1-D `row`."""
    n, m = len(row), len(pattern)
    if m == 0 or n < m:
        return []
    windows = np.lib.stride_tricks.sliding_window_view(row, m)
    return list(np.nonzero((windows == pattern).all(axis=1))[0])


def mask_non_assistant_labels(input_ids: np.ndarray, text_tokenizer,
                              pad_token_id: Optional[int] = None,
                              supervise_eos: bool = False,
                              attention_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """labels := input_ids on assistant spans, IGNORE_INDEX elsewhere.

    `supervise_eos=True` extends each span THROUGH its closing `<|im_end|>`
    marker and masks padding via `attention_mask` instead of the pad id
    (pad == <|im_end|> for Qwen-style tokenizers, so the reference's id-based
    re-mask silently unsupervises every end marker — fine when starting from
    a pretrained Qwen3 that already emits <|im_end|>, fatal for from-scratch
    training where the model must LEARN to stop; see tools/rehearsal.py)."""
    labels = np.full_like(input_ids, IGNORE_INDEX)
    start_marker = np.asarray(text_tokenizer.encode("<|im_start|>assistant\n"), dtype=input_ids.dtype)
    end_marker = np.asarray(text_tokenizer.encode("<|im_end|>"), dtype=input_ids.dtype)

    for i in range(input_ids.shape[0]):
        row = input_ids[i]
        seq_len = row.shape[0]
        starts = [p + len(start_marker) for p in _find_subsequence(row, start_marker)]
        ends = _find_subsequence(row, end_marker)
        for start in starts:
            valid_ends = [e for e in ends if e > start]
            end = min(valid_ends) if valid_ends else seq_len
            if supervise_eos and valid_ends:
                end += len(end_marker)
            end = min(end, seq_len)
            if start < end:
                labels[i, start:end] = row[start:end]

    if supervise_eos:
        if attention_mask is None:
            raise ValueError("supervise_eos=True needs attention_mask for pad masking")
        labels[np.asarray(attention_mask) == 0] = IGNORE_INDEX
    else:
        pad_id = pad_token_id if pad_token_id is not None else text_tokenizer.pad_token_id
        labels[input_ids == pad_id] = IGNORE_INDEX
    return labels


def _bucket(width: int, multiple: Optional[int]) -> Optional[int]:
    if multiple is None:
        return None
    return ((max(width, 1) + multiple - 1) // multiple) * multiple


def sft_collate(
    examples: Sequence[Dict[str, Any]],
    processor: BioProcessor,
    max_length_text: int,
    max_length_dna: int,
    bucket: Optional[int] = None,
    return_answer: bool = False,
    max_dna_per_item: Optional[int] = None,
    supervise_eos: bool = False,
) -> Dict[str, Any]:
    """Collate chat-formatted examples (with 'prompt' messages and
    'dna_sequences') into model-ready arrays with SFT labels.

    `supervise_eos=True` keeps the final assistant `<|im_end|>` in the
    rendered text AND in the supervised labels (see
    mask_non_assistant_labels) — required when training from scratch so the
    model learns to terminate; default False matches the reference collator
    exactly (continue_final_message truncation + pad-id re-mask)."""
    if supervise_eos:
        from bioreason_tpu.data.chat_template import render_chat

        def _render(ex):
            text = render_chat(ex["prompt"], add_generation_prompt=False)
            # keep the final <|im_end|>, drop only the trailing newline
            end = text.rindex("<|im_end|>") + len("<|im_end|>")
            return text[:end]

        prompts_text = [_render(ex) for ex in examples]
    else:
        prompts_text = [apply_chat_template(ex)["prompt"] for ex in examples]
    batch_dna = [ex["dna_sequences"] for ex in examples]

    # Pre-tokenize DNA once to know the expanded text width when bucketing.
    out = processor(
        text=prompts_text,
        batch_dna_sequences=batch_dna,
        max_length_text=max_length_text,
        max_length_dna=max_length_dna,
        padding_side="left",
        pad_dna_to=None,
    )
    if bucket is not None:
        t_w = _bucket(out.input_ids.shape[1], bucket)
        d_w = _bucket(out.dna_input_ids.shape[1], bucket) if out.dna_input_ids is not None else None
        out = processor(
            text=prompts_text,
            batch_dna_sequences=batch_dna,
            max_length_text=max_length_text,
            max_length_dna=max_length_dna,
            padding_side="left",
            pad_text_to=t_w,
            pad_dna_to=d_w,
        )

    labels = mask_non_assistant_labels(out.input_ids, processor.text_tokenizer,
                                       supervise_eos=supervise_eos,
                                       attention_mask=out.attention_mask)
    batch: Dict[str, Any] = {
        "input_ids": out.input_ids,
        "attention_mask": out.attention_mask,
        "dna_input_ids": out.dna_input_ids,
        "dna_attention_mask": out.dna_attention_mask,
        "batch_idx_map": out.batch_idx_map,
        "labels": labels,
    }
    if return_answer:
        batch["answer"] = [ex["answer"].strip() for ex in examples]
    return batch


def classifier_collate(
    examples: Sequence[Dict[str, Any]],
    dna_tokenizer,
    label2id: Dict[str, int],
    max_length: int = 2048,
    bucket: Optional[int] = None,
) -> Dict[str, Any]:
    ref = [ex["reference_sequence"] for ex in examples]
    alt = [ex["variant_sequence"] for ex in examples]
    pad_to = None
    if bucket is not None:
        longest = max(max(len(dna_tokenizer.encode(s)) + 1 for s in ref + alt), 1)
        pad_to = _bucket(min(longest, max_length), bucket)
    t_ref = dna_tokenizer(ref, max_length=max_length, padding=True, truncation=True, pad_to=pad_to)
    t_alt = dna_tokenizer(alt, max_length=max_length, padding=True, truncation=True, pad_to=pad_to)
    labels = np.asarray([label2id[ex["answer"]] for ex in examples], dtype=np.int32)
    return {
        "ref_ids": np.asarray(t_ref["input_ids"], dtype=np.int32),
        "ref_attention_mask": np.asarray(t_ref["attention_mask"], dtype=np.int32),
        "alt_ids": np.asarray(t_alt["input_ids"], dtype=np.int32),
        "alt_attention_mask": np.asarray(t_alt["attention_mask"], dtype=np.int32),
        "labels": labels,
    }
