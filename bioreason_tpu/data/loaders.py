"""Local dataset loading for KEGG / ClinVar VEP corpora.

The reference pulls `wanglab/kegg` and `wanglab/bioR_tasks` from the HF hub
(train_dna_qwen.py:413-642, train_dna_only.py:272-320). This environment is
offline, so loading works from local artifacts in any of these layouts:

  * a directory of per-variant .json files (reference KEGGDataset layout)
  * a .jsonl file (one example per line)
  * a .json file holding a list of examples
  * a HF `datasets.save_to_disk` directory (loaded via the installed
    `datasets` package when present)

All loaders normalize to the canonical item dict:
  {question, answer, reasoning, reference_sequence, variant_sequence}
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

from bioreason_tpu.data.kegg import process_kegg_item


def _normalize(item: Dict[str, Any]) -> Dict[str, Any]:
    if "reasoning" in item and isinstance(item["reasoning"], dict):
        return process_kegg_item(item)
    out = {
        "question": item.get("question", ""),
        "answer": str(item.get("answer", "")).strip(),
        "reasoning": item.get("reasoning", "") or "",
        "reference_sequence": item.get("reference_sequence", "").upper().strip(),
        "variant_sequence": item.get("variant_sequence", "").upper().strip(),
    }
    if "ID" in item:       # hub-schema record ids (VEP tasks 2/3)
        out["ID"] = item["ID"]
    return out


def load_local_dataset(path: str) -> List[Dict[str, Any]]:
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "dataset_info.json")) or \
           os.path.exists(os.path.join(path, "state.json")):
            try:
                import datasets
                ds = datasets.load_from_disk(path)
                if hasattr(ds, "keys") and not hasattr(ds, "features"):  # DatasetDict
                    ds = ds[sorted(ds.keys())[0]]
                return [_normalize(dict(x)) for x in ds]
            except Exception:
                pass
        items = []
        for f in sorted(os.listdir(path)):
            fp = os.path.join(path, f)
            if f.endswith(".jsonl"):
                items.extend(load_local_dataset(fp))
            elif f.endswith(".json"):
                with open(fp, encoding="utf-8") as fh:
                    data = json.load(fh)
                if isinstance(data, list):
                    items.extend(_normalize(x) for x in data)
                else:
                    items.append(_normalize(data))
        return items
    if path.endswith(".jsonl"):
        with open(path, encoding="utf-8") as fh:
            return [_normalize(json.loads(line)) for line in fh if line.strip()]
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        return [_normalize(x) for x in (data if isinstance(data, list) else [data])]
    raise ValueError(f"unsupported dataset path: {path}")
