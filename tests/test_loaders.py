import json

import pytest

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


class TestCurationPipeline:
    """End-to-end local curation: FASTA + variant TSV -> JSONL -> loaders ->
    collate (the computational core of the reference's data notebooks)."""

    def _write_inputs(self, tmp):
        import numpy as np
        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("ACGT"), 400))
        fasta = tmp / "genome.fa"
        fasta.write_text(f">chr1 test contig\n{seq[:200]}\n{seq[200:]}\n")
        tsv = tmp / "vars.tsv"
        rows = ["chrom\tpos\tref\talt\tanswer\tgene\treasoning"]
        for pos in (50, 150, 300):
            ref = seq[pos - 1]
            alt = "A" if ref != "A" else "G"
            rows.append(f"chr1\t{pos}\t{ref}\t{alt}\tpathogenic\tBRCA1\t"
                        f"The variant changes {ref} to {alt}.")
        tsv.write_text("\n".join(rows) + "\n")
        return fasta, tsv, seq

    def test_curate_cli_roundtrip(self, tmp_path):
        from bioreason_tpu.cli.curate import main as curate_main
        from bioreason_tpu.data.loaders import load_local_dataset
        fasta, tsv, seq = self._write_inputs(tmp_path)
        out = tmp_path / "items.jsonl"
        curate_main(["--fasta", str(fasta), "--variants", str(tsv),
                     "--task", "variant_effect_coding", "--flank", "30",
                     "--out", str(out)])
        items = load_local_dataset(str(out))
        assert len(items) == 3
        it = items[0]
        assert it["answer"] == "pathogenic"
        assert len(it["reference_sequence"]) <= 61
        assert it["reference_sequence"] != it["variant_sequence"]
        # windows genuinely come from the genome
        assert it["reference_sequence"] in seq.upper()
        assert "pathogenic or benign" in it["question"]
        assert "BRCA1" in it["question"]

    def test_ref_allele_validation(self, tmp_path):
        import pytest as _pytest
        from bioreason_tpu.data.curation import (curate_items, read_fasta,
                                                 read_variant_table)
        fasta, tsv, _ = self._write_inputs(tmp_path)
        contigs = read_fasta(str(fasta))
        rows = read_variant_table(str(tsv))
        rows[1]["ref"] = "N"                       # corrupt one row
        with _pytest.raises(ValueError, match="reference allele mismatch"):
            curate_items(contigs, rows, task="kegg", flank=30)
        kept = curate_items(contigs, rows, task="kegg", flank=30,
                            validate_ref=False)
        assert len(kept) == 2


class TestEqtlOmimCuration:
    """VEP.ipynb tasks 2/3 parity: hub-schema records for the causal-eQTL
    and pathogenic-OMIM tasks, from sequence tables or genome windows."""

    def test_question_banks(self):
        from bioreason_tpu.data.curation import question_bank
        eqtl, omim = question_bank("eqtl"), question_bank("omim")
        # the notebook uses 50 GPT-paraphrased questions per task
        assert len(set(eqtl)) == 50 and len(set(omim)) == 50
        assert all("{chrom}" in q and "{tissue}" in q for q in eqtl)
        assert all("{chrom}" in q and "{tissue}" not in q for q in omim)

    def test_eqtl_from_sequence_table(self, tmp_path):
        from bioreason_tpu.cli.curate import main as curate_main
        from bioreason_tpu.data.loaders import load_local_dataset
        from bioreason_tpu.data.variant_effect import format_variant_effect_for_dna_llm
        p = tmp_path / "eqtl.tsv"
        p.write_text(
            "chromosome\ttissue\tlabel\tref_forward_sequence\talt_forward_sequence\n"
            "7\tLiver\tYes\tacgtacgt\tacctacgt\n"
            "X\tBrain - Cortex\tNo\tggggcccc\tggtgcccc\n")
        out = tmp_path / "eqtl.jsonl"
        curate_main(["--variants", str(p), "--task", "eqtl",
                     "--out", str(out)])
        items = load_local_dataset(str(out))
        assert [it["ID"] for it in items] == ["Task2_train_0", "Task2_train_1"]
        assert items[0]["answer"] == "Yes"
        assert "Chromosome 7" in items[0]["question"]
        assert "Liver" in items[0]["question"]
        assert items[0]["reference_sequence"] == "ACGTACGT"
        assert items[1]["variant_sequence"] == "GGTGCCCC"
        # hub-schema records feed the VEP dataset-layer formatter directly
        ex = format_variant_effect_for_dna_llm(items[0])
        assert ex["dna_sequences"] == ["ACGTACGT", "ACCTACGT"]

    def test_omim_from_genome_windows(self, tmp_path):
        from bioreason_tpu.data.curation import curate_omim, read_task_table
        p = tmp_path / "omim.csv"
        genome = "ACGT" * 10
        p.write_text("chrom,pos,ref,alt,label\n"
                     "chr1,3,G,T,Pathogenic\n"
                     "chr1,13,A,C,Common\n")
        rows = read_task_table(str(p))
        items = curate_omim(rows, contigs={"chr1": genome}, flank=4)
        assert [it["ID"] for it in items] == ["Task3_test_0", "Task3_test_1"]
        # 'Common' maps to 'Benign' (VEP.ipynb task_3 label apply)
        assert [it["answer"] for it in items] == ["Pathogenic", "Benign"]
        assert "pathogenic" in items[0]["question"].lower()
        assert "benign" in items[0]["question"].lower()
        assert items[0]["reference_sequence"] in genome
        assert items[0]["reference_sequence"] != items[0]["variant_sequence"]

    def test_seeded_questions_reproducible(self):
        from bioreason_tpu.data.curation import curate_eqtl
        rows = [{"chromosome": "1", "tissue": "Lung", "label": "Yes",
                 "reference_sequence": "AAAA", "variant_sequence": "AACA"}
                for _ in range(8)]
        a = curate_eqtl(rows, seed=3)
        b = curate_eqtl(rows, seed=3)
        c = curate_eqtl(rows, seed=4)
        assert [x["question"] for x in a] == [x["question"] for x in b]
        assert [x["question"] for x in a] != [x["question"] for x in c]
        assert len({x["question"] for x in a}) > 1    # paraphrases vary


class TestPrefetch:
    def test_same_sequence(self):
        from bioreason_tpu.train.dataflow import batch_iterator, prefetch
        items = list(range(23))
        collate = lambda xs: sum(xs)
        plain = list(batch_iterator(items, collate, 4, seed=1, epochs=2))
        fetched = list(prefetch(batch_iterator(items, collate, 4, seed=1,
                                               epochs=2)))
        assert fetched == plain

    def test_exception_propagates(self):
        import pytest
        from bioreason_tpu.train.dataflow import prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_overlaps_consumer(self):
        # producer keeps filling the buffer while the consumer holds an item
        import time
        from bioreason_tpu.train.dataflow import prefetch
        produced = []

        def gen():
            for i in range(4):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=2)
        assert next(it) == 0
        time.sleep(0.2)           # producer should have buffered ahead
        assert len(produced) >= 3
        assert list(it) == [1, 2, 3]


class TestClinVarCuration:
    """ClinVar variant_summary-style ingestion (the Clinvar_Coding /
    Clinvar_SNV_Non_SNV notebook tail, reference data/README.md)."""

    GENOME = "ACGT" * 64

    def _tsv(self, tmp_path):
        cols = ["#AlleleID", "Type", "GeneSymbol", "ClinicalSignificance",
                "Chromosome", "PositionVCF", "ReferenceAlleleVCF",
                "AlternateAlleleVCF", "Assembly"]
        # pos is 1-based; GENOME[pos-1] must equal ref
        rows = [
            ["1", "single nucleotide variant", "BRCA1",
             "Pathogenic; risk factor", "chr1", "9", "A", "G", "GRCh38"],
            ["2", "Deletion", "TP53", "Benign", "chr1", "13", "ACG", "A",
             "GRCh38"],
            ["3", "single nucleotide variant", "BRCA2", "Benign",
             "chr1", "17", "A", "T", "GRCh37"],      # filtered by assembly
        ]
        p = tmp_path / "clinvar.tsv"
        with open(p, "w") as f:
            f.write("\t".join(cols) + "\n")
            for r in rows:
                f.write("\t".join(r) + "\n")
        return str(p)

    def test_split_and_answer_cleaning(self, tmp_path):
        from bioreason_tpu.data.curation import (curate_clinvar,
                                                 read_clinvar_table)
        rows = read_clinvar_table(self._tsv(tmp_path), assembly="GRCh38")
        assert len(rows) == 2
        assert [r["variant_class"] for r in rows] == ["snv", "non_snv"]

        contigs = {"chr1": self.GENOME}
        coding = curate_clinvar(contigs, rows, "variant_effect_coding",
                                flank=6)
        non_snv = curate_clinvar(contigs, rows, "variant_effect_non_snv",
                                 flank=6)
        assert len(coding) == 1 and len(non_snv) == 1
        # coding cleaner: text before ';', lowered (variant_effect.py:26-31)
        assert coding[0]["answer"] == "pathogenic"
        assert coding[0]["gene"] == "BRCA1"
        # the SNV is applied at the window offset
        ref, var = coding[0]["reference_sequence"], coding[0]["variant_sequence"]
        assert len(ref) == len(var) and ref != var
        assert non_snv[0]["answer"] == "benign"
        # deletion shortens the variant window by len(ref)-len(alt)
        assert (len(non_snv[0]["reference_sequence"])
                - len(non_snv[0]["variant_sequence"])) == 2

    def test_ref_mismatch_raises(self, tmp_path):
        from bioreason_tpu.data.curation import (curate_clinvar,
                                                 read_clinvar_table)
        p = tmp_path / "bad.tsv"
        with open(p, "w") as f:
            f.write("Chromosome\tPositionVCF\tReferenceAlleleVCF\t"
                    "AlternateAlleleVCF\tClinicalSignificance\tType\n")
            f.write("chr1\t9\tG\tT\tBenign\tsingle nucleotide variant\n")
        rows = read_clinvar_table(str(p))
        with pytest.raises(ValueError, match="reference allele mismatch"):
            curate_clinvar({"chr1": self.GENOME}, rows,
                           "variant_effect_coding", flank=6)


class TestPrefetchShutdown:
    def test_early_abandon_stops_producer(self):
        """ADVICE r2: breaking out of a prefetch iterator (e.g. --max_steps)
        must terminate the producer thread instead of leaking it blocked on
        a full queue."""
        import threading
        import time
        from bioreason_tpu.train.dataflow import prefetch

        before = threading.active_count()
        it = prefetch(iter(range(1000)), depth=2)
        assert next(it) == 0
        it.close()                       # the --max_steps break path
        for _ in range(50):              # worker exits within ~100ms poll
            if threading.active_count() <= before:
                break
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_full_queue_at_exhaustion_still_terminates(self):
        """The sentinel must arrive even when the buffer is full at iterator
        exhaustion (slow consumer)."""
        import time
        from bioreason_tpu.train.dataflow import prefetch
        it = prefetch(iter([1, 2, 3]), depth=1)
        time.sleep(0.3)                  # producer fills buffer + blocks
        assert list(it) == [1, 2, 3]     # must not hang
