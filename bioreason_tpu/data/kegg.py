"""KEGG disease-pathway dataset layer (reference: bioreason/dataset/kegg.py).

`KEGGDataset` loads one JSON file per variant from a directory and normalizes
fields exactly like the reference (:41-71): answer lower-cased/stripped,
reasoning steps joined with newlines, sequences upper-cased/stripped.

`format_kegg_for_dna_llm` / `format_kegg_for_llm` produce the chat-message
examples (reference :164-220): two DNA content parts (ref + variant) followed
by the question; the assistant turn carries the reasoning trace in
`reasoning_content` and `Answer: {answer}` as content. The LLM-only variant
pastes the raw sequences into the question text and sends empty DNA strings.

`synthetic_kegg_items` generates a deterministic KEGG-shaped corpus for
tests/benches (no network access in this environment).
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List


class KEGGDataset:
    def __init__(self, data_dir: str):
        self.data_dir = data_dir
        self.data: List[Dict[str, Any]] = []
        for filename in sorted(f for f in os.listdir(data_dir) if f.endswith(".json")):
            with open(os.path.join(data_dir, filename), encoding="utf-8") as f:
                item = json.load(f)
            item["kegg_id"] = filename.split("_")[1] if "_" in filename else filename
            self.data.append(process_kegg_item(item))

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]


def process_kegg_item(item: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "question": item.get("question", ""),
        "answer": item.get("answer", "").lower().strip(),
        "reasoning": "\n".join(item.get("reasoning", {}).get("reasoning_steps", [])),
        "reference_sequence": item.get("reference_sequence", "").upper().strip(),
        "variant_sequence": item.get("variant_sequence", "").upper().strip(),
    }


def get_format_kegg_function(model_name: str):
    if model_name.lower() == "llm":
        return format_kegg_for_llm
    if model_name.lower() == "dna-llm":
        return format_kegg_for_dna_llm
    raise ValueError(f"Unsupported model name: {model_name}")


def format_kegg_for_dna_llm(example: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "prompt": [
            {
                "role": "user",
                "content": [
                    *({"type": "dna", "text": None} for _ in range(2)),
                    {"type": "text", "text": example["question"].strip()},
                ],
            },
            {
                "role": "assistant",
                "reasoning_content": example["reasoning"].strip(),
                "content": [{"type": "text", "text": f"Answer: {example['answer'].strip()}"}],
            },
        ],
        "dna_sequences": [example["reference_sequence"], example["variant_sequence"]],
        "answer": example["answer"],
    }


def format_kegg_for_llm(example: Dict[str, Any]) -> Dict[str, Any]:
    question = (f"Reference sequence: {example['reference_sequence']}\n"
                f"Variant sequence: {example['variant_sequence']}\n"
                f"Question: {example['question']}")
    return {
        "prompt": [
            {
                "role": "user",
                "content": [
                    *({"type": "dna", "text": None} for _ in range(2)),
                    {"type": "text", "text": question.strip()},
                ],
            },
            {
                "role": "assistant",
                "reasoning_content": example["reasoning"].strip(),
                "content": [{"type": "text", "text": f"Answer: {example['answer'].strip()}"}],
            },
        ],
        "dna_sequences": ["", ""],
        "answer": example["answer"],
    }


def format_kegg_prompt_only(example: Dict[str, Any]) -> Dict[str, Any]:
    """GRPO prompt-only mapping (reference reason.py:128-148)."""
    return {
        "prompt": [
            {
                "role": "user",
                "content": [
                    *({"type": "dna", "text": None} for _ in range(2)),
                    {"type": "text", "text": example["question"]},
                ],
            },
        ],
        "dna_sequences": [example["reference_sequence"], example["variant_sequence"]],
        "answer": example["answer"],
    }


_PATHWAYS = [
    "mapk signaling pathway", "p53 signaling pathway", "wnt signaling pathway",
    "apoptosis", "cell cycle", "dna repair", "notch signaling pathway",
    "hedgehog signaling pathway",
]


def synthetic_kegg_items(n: int = 64, seq_len: int = 256, seed: int = 0,
                         learnable: bool = False,
                         fixed_positions: bool = False) -> List[Dict[str, Any]]:
    """Deterministic KEGG-shaped items for tests and benchmarks.

    `learnable=True` makes the answer a FUNCTION of the DNA content —
    pathway index = 2 * base(alt) + (pos in second half) — so a model can
    generalize to held-out items by actually comparing the two sequences
    (find the mismatch, read its base and rough position). The default
    (random answers) is right for throughput benches and memorization
    tests; learnable corpora are what the end-to-end quality rehearsal
    trains and evaluates on (tools/rehearsal.py), standing in for the real
    wanglab/kegg data this environment doesn't have.

    `fixed_positions=True` restricts the mismatch to one of TWO fixed loci
    (seq_len//4 and 3*seq_len//4, one per half) and substitutes an 8-base
    RUN of the alt base (a deletion-scale lesion) instead of a single base.
    The decoder then only has to compare the spliced encoder embeddings at
    two known offsets, and the encoder-side signal is spatially redundant —
    an easier landing ramp for from-scratch towers than scanning seq_len
    positions for a single-base mismatch.

    Reasoning-template note: every assistant token must be a FUNCTION of
    information the model can extract, or autoregressive generation derails
    where teacher-forced loss cannot see it — the template therefore names
    only the alt base and the half (both inferable from the variant alone
    when fixed_positions=True), never the reference base at the locus
    (exact-position indexing, measured unlearnable at tiny scale: the r4
    probes derailed at that char and collapsed to a fixed mode)."""
    rng = random.Random(seed)
    loci = (seq_len // 4, (3 * seq_len) // 4)
    run = 8
    items = []
    for i in range(n):
        ref = "".join(rng.choice("ACGT") for _ in range(seq_len))
        pos = rng.choice(loci) if fixed_positions else rng.randrange(seq_len)
        alt_base = rng.choice([b for b in "ACGT" if b != ref[pos]])
        if fixed_positions:
            # clamp the run to the sequence end so variant stays equal-length
            # with reference for any seq_len (the uniform-batch invariant)
            r = min(run, seq_len - pos)
            var = ref[:pos] + alt_base * r + ref[pos + r:]
        else:
            var = ref[:pos] + alt_base + ref[pos + 1:]
        if learnable:
            half = "second" if pos >= seq_len // 2 else "first"
            answer = _PATHWAYS["ACGT".index(alt_base) * 2
                               + (pos >= seq_len // 2)]
            # every reasoning token is inferable from the DNA (no reference-
            # base-at-locus indexing — see the template note above)
            reasoning = (f"The variant substitutes {alt_base} in the "
                         f"{half} half of the sequence.\n"
                         f"This affects a regulatory region linked to the {answer}.\n"
                         f"Therefore the most likely disrupted pathway is the {answer}.")
        else:
            answer = rng.choice(_PATHWAYS)
            reasoning = (f"The variant at position {pos} changes {ref[pos]} to {alt_base}.\n"
                         f"This affects a regulatory region linked to the {answer}.\n"
                         f"Therefore the most likely disrupted pathway is the {answer}.")
        items.append({
            "question": ("Given the reference and variant DNA sequences, which KEGG "
                         "pathway is most likely disrupted by this variant?"),
            "answer": answer,
            "reasoning": reasoning,
            "reference_sequence": ref,
            "variant_sequence": var,
        })
    return items
