"""Data-curation helpers: variant windows and sequence construction.

The reference's curation layer (data/*.ipynb, SURVEY §2.1 'Data curation
pipeline') fetches KEGG/ClinVar/Ensembl records and builds (reference,
variant) sequence windows of ±1000 nt around each variant. The network/API
plumbing is out of scope here; this module provides the COMPUTATIONAL core so
locally-available genome/variant tables can be turned into training items:

  * `extract_window`  — ±flank window around a position, clamped to bounds
  * `apply_variant`   — SNV/insertion/deletion/indel application with
                        reference-allele validation
  * `build_variant_item` — (window_ref, window_alt, metadata) -> canonical
                        training-item dict consumed by data/loaders.py
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class Variant:
    position: int          # 0-based position in the chromosome/contig string
    ref_allele: str        # "" for pure insertions
    alt_allele: str        # "" for pure deletions


def extract_window(sequence: str, position: int, flank: int = 1000) -> tuple[str, int]:
    """Return (window, offset_of_position_in_window), clamped at bounds."""
    start = max(0, position - flank)
    end = min(len(sequence), position + flank)
    return sequence[start:end], position - start


def apply_variant(window: str, offset: int, variant: Variant,
                  validate: bool = True) -> str:
    """Apply an SNV/ins/del/indel at `offset` within `window`."""
    ref = variant.ref_allele.upper()
    alt = variant.alt_allele.upper()
    if validate and ref:
        found = window[offset:offset + len(ref)].upper()
        if found != ref:
            raise ValueError(
                f"reference allele mismatch at offset {offset}: "
                f"expected {ref!r}, found {found!r}")
    return window[:offset] + alt + window[offset + len(ref):]


def build_variant_item(chrom_sequence: str, variant: Variant, question: str,
                       answer: str, reasoning: str = "", flank: int = 1000,
                       metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Canonical training item from a contig + variant (loaders.py layout)."""
    window, offset = extract_window(chrom_sequence, variant.position, flank)
    alt_window = apply_variant(window, offset, variant)
    item = {
        "question": question,
        "answer": answer.strip().lower(),
        "reasoning": reasoning,
        "reference_sequence": window.upper(),
        "variant_sequence": alt_window.upper(),
    }
    if metadata:
        item.update(metadata)
    return item
