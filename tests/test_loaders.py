import json

from bioreason_tpu.data.loaders import load_local_dataset
from bioreason_tpu.data.kegg import synthetic_kegg_items


def test_jsonl_file(tmp_path):
    items = synthetic_kegg_items(3, seq_len=20)
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    out = load_local_dataset(str(p))
    assert len(out) == 3
    assert out[0]["reference_sequence"] == items[0]["reference_sequence"]


def test_json_list_file(tmp_path):
    items = synthetic_kegg_items(2, seq_len=20, seed=1)
    p = tmp_path / "data.json"
    with open(p, "w") as f:
        json.dump(items, f)
    out = load_local_dataset(str(p))
    assert len(out) == 2


def test_kegg_style_dir(tmp_path):
    # one json per variant, reference KEGGDataset layout incl. nested reasoning
    raw = {"question": "q?", "answer": "  P53 Pathway ",
           "reasoning": {"reasoning_steps": ["a", "b"]},
           "reference_sequence": "acgt", "variant_sequence": "aagt"}
    with open(tmp_path / "hsa_05200_1.json", "w") as f:
        json.dump(raw, f)
    out = load_local_dataset(str(tmp_path))
    assert len(out) == 1
    assert out[0]["answer"] == "p53 pathway"      # lower+strip (kegg normalize)
    assert out[0]["reasoning"] == "a\nb"
    assert out[0]["reference_sequence"] == "ACGT"


class TestCuration:
    def test_window_and_snv(self):
        from bioreason_tpu.data.curation import Variant, extract_window, apply_variant
        seq = "A" * 50 + "C" + "G" * 50
        win, off = extract_window(seq, 50, flank=10)
        assert len(win) == 20 and win[off] == "C"
        alt = apply_variant(win, off, Variant(50, "C", "T"))
        assert alt[off] == "T" and len(alt) == len(win)

    def test_indels_and_validation(self):
        import pytest
        from bioreason_tpu.data.curation import Variant, apply_variant
        win = "ACGTACGT"
        assert apply_variant(win, 2, Variant(0, "GT", "")) == "ACACGT"      # deletion
        assert apply_variant(win, 2, Variant(0, "", "TTT")) == "ACTTTGTACGT"  # insertion
        with pytest.raises(ValueError, match="mismatch"):
            apply_variant(win, 2, Variant(0, "AA", "T"))

    def test_build_item(self):
        from bioreason_tpu.data.curation import Variant, build_variant_item
        seq = "ACGT" * 100
        item = build_variant_item(seq, Variant(200, "A", "G"), "what effect?",
                                  "Pathogenic", flank=16)
        assert item["answer"] == "pathogenic"
        assert len(item["reference_sequence"]) == 32
        assert item["reference_sequence"] != item["variant_sequence"]
