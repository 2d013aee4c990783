"""Generative evaluation harness.

Reproduces the reference benchmark pipeline (`on_test_epoch_end`,
train_dna_qwen.py:645-939) — the eval behind the README KEGG/VEP tables:

  * render the PROMPT portion (user turn + generation prompt) of each test
    example, generate with temperature 0.6 / top_p 0.95 / top_k 20 (or
    greedy), decode with special tokens kept;
  * ground truth cleaned by taking text before ';' (reference :776-778);
  * binary substring scheme with labels = (negative, positive):
      positive example & generation contains truth -> TP
      positive example & not contains            -> FN
      negative example & contains                -> TN   (reference quirk:
        "contains the NEGATIVE label" counts as TN — kept for metric parity,
        see SURVEY §' quirks'; substring confusions like 'pathogenic' in
        'not pathogenic' are inherited)
      negative example & not contains            -> FP
    examples matching neither label still increment the total (reference
    behavior), lowering accuracy;
  * accuracy/precision/recall/F1 with the reference's max(...,1) guards;
  * per-example generations dumped to CSV.

TPU difference: generation runs in BATCHES through the jitted engine instead
of the reference's one-example-at-a-time HF generate loop.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax

from bioreason_tpu.config import SamplingConfig
from bioreason_tpu.data.chat_template import render_chat
from bioreason_tpu.data.processor import BioProcessor
from bioreason_tpu.generate.engine import GenerationEngine


@dataclass
class EvalResult:
    accuracy: float
    precision: float
    recall: float
    f1: float
    true_positives: int
    false_positives: int
    true_negatives: int
    false_negatives: int
    total: int
    generations: List[Dict[str, Any]] = field(default_factory=list)

    def summary(self) -> Dict[str, float]:
        return {"test_accuracy": self.accuracy, "test_precision": self.precision,
                "test_recall": self.recall, "test_f1": self.f1}


def _prompt_messages(example: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Drop assistant turns; keep system/user (eval generates the answer)."""
    return [m for m in example["prompt"] if m["role"] != "assistant"]


def evaluate_generative(
    engine: GenerationEngine,
    params: Dict,
    processor: BioProcessor,
    examples: Sequence[Dict[str, Any]],
    labels: Tuple[str, str],
    sampling: SamplingConfig = SamplingConfig(),
    max_new_tokens: int = 800,
    batch_size: int = 8,
    greedy: bool = False,
    rng: Optional[jax.Array] = None,
    csv_path: Optional[str] = None,
    max_length_text: int = 512,
    max_length_dna: int = 2048,
) -> EvalResult:
    neg_label, pos_label = labels[0], labels[1]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tok = processor.text_tokenizer

    tp = tn = fp = fn = total = 0
    generations: List[Dict[str, Any]] = []

    for start in range(0, len(examples), batch_size):
        chunk = list(examples[start:start + batch_size])
        rendered = [render_chat(_prompt_messages(ex), add_generation_prompt=True)
                    for ex in chunk]
        batch_dna = [ex["dna_sequences"] for ex in chunk]
        out = processor(text=rendered, batch_dna_sequences=batch_dna,
                        max_length_text=max_length_text, max_length_dna=max_length_dna,
                        padding_side="left")
        rng, k = jax.random.split(rng)
        completion_ids, completion_mask = engine.generate(
            params, out.input_ids, out.attention_mask,
            out.dna_input_ids, out.dna_attention_mask,
            sampling=sampling, max_new_tokens=max_new_tokens, greedy=greedy, rng=k)

        for i, ex in enumerate(chunk):
            gen_text = tok.decode(
                completion_ids[i][completion_mask[i].astype(bool)],
                skip_special_tokens=False).strip()
            ground_truth = ex["answer"]
            if ";" in ground_truth:
                ground_truth = ground_truth.split(";")[0]
            is_pos = ground_truth.lower() == pos_label.lower()
            is_neg = ground_truth.lower() == neg_label.lower()
            contains = ground_truth.lower() in gen_text.lower()

            total += 1
            if is_pos and contains:
                tp += 1
                cat = "TP"
            elif is_pos:
                fn += 1
                cat = "FN"
            elif is_neg and contains:
                tn += 1
                cat = "TN"
            elif is_neg:
                fp += 1
                cat = "FP"
            else:
                cat = "OTHER"
            generations.append({
                "example_idx": start + i,
                "user_input": rendered[i],
                "generation": gen_text,
                "ground_truth": ground_truth,
                "contains_ground_truth": contains,
                "is_positive_example": is_pos,
                "prediction_category": cat,
            })

    accuracy = (tp + tn) / max(total, 1)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)

    if csv_path:
        os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
        with open(csv_path, "w", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=list(generations[0].keys()))
            writer.writeheader()
            writer.writerows(generations)

    return EvalResult(accuracy, precision, recall, f1, tp, fp, tn, fn, total,
                      generations)


def teacher_forced_probe(
    params: Dict,
    fusion_cfg,
    processor: BioProcessor,
    examples: Sequence[Dict[str, Any]],
    markers: Dict[str, str],
    batch_size: int = 8,
    max_length_text: int = 512,
    max_length_dna: int = 2048,
    supervise_eos: bool = False,
    forward_fn=None,
) -> Dict[str, float]:
    """Teacher-forced next-token accuracy at named marker positions.

    Renders each example exactly like the SFT collator (gold assistant turn
    included), runs the fusion forward for logits, and for each
    `markers[name] = text` measures argmax accuracy at the token immediately
    AFTER the (first) occurrence of `text` in the row. Also reports
    `span_acc`, argmax accuracy over the whole supervised span.

    This is the eval that separates 'cannot generate' from 'never learned':
    val loss averages over ~250 template tokens and hides total failure on
    the few input-dependent ones (the round-4 rehearsal: val loss 0.0118 ==
    ln4+ln2 spread over the span — exactly the entropy of the two unlearned
    DNA-dependent decisions; artifacts/rehearsal_bench.json). The reference
    has no counterpart (its eval is generation-only,
    train_dna_qwen.py:645-939); this probe exists to attribute quality
    failures between the training and generation halves of the pipeline.
    """
    import numpy as np

    from bioreason_tpu.data.collate import IGNORE_INDEX, sft_collate
    from bioreason_tpu.models.fusion import fusion_forward

    tok = processor.text_tokenizer
    marker_ids = {name: np.asarray(tok.encode(text), dtype=np.int32)
                  for name, text in markers.items()}
    hits = {name: 0 for name in markers}
    counts = {name: 0 for name in markers}
    span_hits = span_count = 0

    if forward_fn is None:
        forward_fn = jax.jit(
            lambda p, ids, am, dids, dam: fusion_forward(
                p, fusion_cfg, ids, am, dids, dam)[0])

    for start in range(0, len(examples), batch_size):
        chunk = list(examples[start:start + batch_size])
        batch = sft_collate(chunk, processor, max_length_text=max_length_text,
                            max_length_dna=max_length_dna,
                            supervise_eos=supervise_eos)
        logits = forward_fn(params, batch["input_ids"], batch["attention_mask"],
                            batch["dna_input_ids"], batch["dna_attention_mask"])
        pred = np.asarray(jnp_argmax_host(logits))            # [B, T]
        ids = np.asarray(batch["input_ids"])
        labels = np.asarray(batch["labels"])
        # shifted: pred[:, t] (from logits at t) predicts ids[:, t+1]
        for i in range(ids.shape[0]):
            row = ids[i]
            sup = labels[i] != IGNORE_INDEX
            # supervised-span accuracy (positions t with supervised t target)
            t_idx = np.nonzero(sup)[0]
            t_idx = t_idx[t_idx > 0]
            span_hits += int((pred[i, t_idx - 1] == row[t_idx]).sum())
            span_count += len(t_idx)
            for name, mids in marker_ids.items():
                from bioreason_tpu.data.collate import _find_subsequence
                pos = _find_subsequence(row, mids)
                if not pos:
                    continue
                q = pos[0] + len(mids)            # first token after marker
                if q < len(row):
                    counts[name] += 1
                    hits[name] += int(pred[i, q - 1] == row[q])

    out = {f"{name}_acc": hits[name] / max(counts[name], 1) for name in markers}
    out["span_acc"] = span_hits / max(span_count, 1)
    return out


def jnp_argmax_host(logits):
    import jax.numpy as jnp
    return jnp.argmax(logits, axis=-1)


def multilabel_substring_accuracy(generations: Sequence[Dict[str, Any]]) -> float:
    """Plain 'generation contains ground truth' accuracy over all examples —
    the sensible multi-class metric alongside the reference's binary scheme."""
    if not generations:
        return 0.0
    return sum(g["contains_ground_truth"] for g in generations) / len(generations)
