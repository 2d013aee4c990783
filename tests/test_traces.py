"""Reasoning-trace generation (data/traces.py) — the local rebuild of the
reference's API-driven KEGG curation notebook
(data/BioReasoning_DataCuration_KEGG.ipynb)."""

import json

import numpy as np
import pytest

from bioreason_tpu.data import traces


VARIANT = {
    "Var_ID": "rs121913529",
    "ENTRY": "hsa:3845",
    "Chr": "12",
    "Start": "25245350",
    "RefAllele": "C",
    "AltAllele": "T",
    "Network Definition": "EGFR-RAS-RAF-MEK-ERK signaling",
    "Gene": json.dumps({"hsa:3845": "KRAS; KRAS proto-oncogene"}),
    "Disease": json.dumps({"Pancreatic cancer": "H00018"}),
}


class TestParsing:
    def test_load_variant_tsv_skips_malformed(self, tmp_path):
        p = tmp_path / "v.tsv"
        p.write_text("Var_ID\tChr\tStart\n"
                     "rs1\t1\t100\n"
                     "broken line without tabs\n"
                     "rs2\t2\t200\n")
        rows = traces.load_variant_tsv(str(p))
        assert [r["Var_ID"] for r in rows] == ["rs1", "rs2"]

    def test_gene_and_disease_fields(self):
        assert traces.gene_names(VARIANT) == "KRAS"
        assert traces.disease_name(VARIANT) == "Pancreatic cancer"
        # bare-string fallbacks (the notebook's try/except path)
        assert traces.gene_names({"Gene": "TP53"}) == "TP53"
        assert traces.disease_name({}) == "Unknown"

    def test_hgvs_forms(self):
        assert traces.hgvs_g("12", 25245350, "C", "T") == \
            "chr12:g.25245350C>T"
        assert traces.hgvs_g("chrX", 5, "AT", "A") == "chrX:g.6del"
        assert traces.hgvs_g("1", 10, "ATT", "A") == "chr1:g.11_12del"
        assert traces.hgvs_g("1", 10, "A", "AGG") == "chr1:g.10_11insGG"
        assert traces.hgvs_g("1", 10, "AC", "GT") == "chr1:g.10_11delinsGT"


class TestTemplateBackend:
    def test_schema_and_step_count(self):
        a = traces.template_analysis(VARIANT)
        assert set(a) == {"raw_data", "question", "answer", "reasoning",
                          "backend"}
        r = a["reasoning"]
        assert r["variant_id"] == "rs121913529"
        assert r["hgvs"] == "chr12:g.25245350C>T"
        assert 8 <= len(r["reasoning_steps"]) <= 12
        assert r["labels"]["genes"] == ["KRAS"]
        assert "KRAS" in a["question"] and "Pancreatic cancer" in a["answer"]

    def test_known_answer_teacher_forcing(self):
        a = traces.template_analysis(VARIANT, known_answer="benign")
        assert a["answer"] == "benign"

    def test_generate_analyses_template(self):
        out = traces.generate_analyses([VARIANT, VARIANT],
                                       known_answers=["x", "y"])
        assert [a["answer"] for a in out] == ["x", "y"]
        assert all(a["backend"] == "template" for a in out)


class TestModelJSONParsing:
    def test_clean_json(self):
        txt = json.dumps({"question": "q?", "answer": "a.",
                          "reasoning_steps": ["s1", "s2"]})
        a = traces.parse_analysis_json(txt, VARIANT)
        assert a["question"] == "q?"
        assert a["reasoning"]["reasoning_steps"] == ["s1", "s2"]
        assert a["reasoning"]["hgvs"] == "chr12:g.25245350C>T"
        assert a["backend"] == "engine"

    def test_fenced_json_with_prose(self):
        txt = ("Here is the analysis:\n```json\n"
               + json.dumps({"question": "q", "answer": "a",
                             "reasoning_steps": ["s"]}) + "\n```\nDone.")
        assert traces.parse_analysis_json(txt, VARIANT) is not None

    def test_rejects_garbage_and_missing_fields(self):
        assert traces.parse_analysis_json("no json here", VARIANT) is None
        assert traces.parse_analysis_json('{"answer": "a"}', VARIANT) is None
        assert traces.parse_analysis_json(
            '{"question": "q", "answer": "a", "reasoning_steps": []}',
            VARIANT) is None

    def test_guided_regex_matches_skeleton(self):
        import re
        rx = re.compile(traces.guided_regex_for_analysis())
        good = ('{"question": "q", "answer": "a", '
                '"reasoning_steps": ["s1", "s2"]}')
        assert rx.fullmatch(good)


class TestEngineBackend:
    def test_tiny_model_falls_back_to_template(self):
        # an untrained tiny model emits garbage -> every row must fall
        # back to the template (counted, never silent), exercising the
        # full prompt->engine->decode->parse path
        import jax
        from bioreason_tpu.config import FusionConfig, SamplingConfig
        from bioreason_tpu.data import (BioProcessor, ByteTextTokenizer,
                                        KmerTokenizer)
        from bioreason_tpu.generate.engine import GenerationEngine
        from bioreason_tpu.models import init_fusion

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        fusion = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                   dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), fusion)
        engine = GenerationEngine(fusion,
                                  eos_token_id=tok.eos_token_id)
        out = traces.generate_analyses(
            [VARIANT], backend="engine", engine=engine, params=params,
            processor=proc, max_new_tokens=8, batch_size=1,
            sampling=SamplingConfig(temperature=1.0, top_k=10, top_p=0.9))
        assert len(out) == 1
        assert out[0]["backend"] == "template-fallback"
        assert 8 <= len(out[0]["reasoning"]["reasoning_steps"]) <= 12


class TestItemOutput:
    def test_analysis_to_item_matches_kegg_schema(self):
        from bioreason_tpu.data.kegg import process_kegg_item
        a = traces.template_analysis(VARIANT)
        item = traces.analysis_to_item(a)
        item.update(reference_sequence="ACGT", variant_sequence="AGGT")
        processed = process_kegg_item(item)
        assert processed["answer"] == a["answer"].lower().strip()
        assert processed["reasoning"].count("\n") == \
            len(a["reasoning"]["reasoning_steps"]) - 1

    def test_combine_analyses_roundtrip(self, tmp_path):
        p = tmp_path / "all.json"
        traces.combine_analyses([traces.template_analysis(VARIANT)], str(p))
        data = json.loads(p.read_text())
        assert len(data) == 1 and data[0]["reasoning"]["variant_id"]
