"""API-retrieval front ends (data/retrieval.py) against canned responses.

Mirrors the KEGG_Data_1.ipynb pipeline shapes: KEGG REST list/link/get flat
files, hsa_var VARIATION cross-refs, Ensembl variation JSON, and the merged
rows feeding curation.curate_items. No network: every test runs through
canned_transport / DirCacheTransport."""

import json
import os

import pytest

from bioreason_tpu.data.retrieval import (DirCacheTransport, ENSEMBL_REST,
                                          EnsemblVariationClient, KEGG_REST,
                                          KeggClient, cache_key,
                                          canned_transport,
                                          extract_variant_refs,
                                          gene_variant_tokens,
                                          parse_kegg_flat,
                                          parse_network_entry,
                                          retrieve_network_variant_rows)

NETWORK_N1 = """\
ENTRY       N00001            Network
NAME        EGF-EGFR-RAS-ERK signaling pathway
DEFINITION  EGF -> EGFR -> (RAS,3845v1) -> ERK
EXPANDED    EGF -> EGFR -> GRB2 -> SOS -> (KRAS,3845v1) -> RAF1
  CLASS     missing-indent-guard
PATHWAY     hsa05200  Pathways in cancer
            hsa04010  MAPK signaling pathway
CLASS       Signal transduction
DISEASE     H00014  Gastric cancer
            H00016  Oral cancer
GENE        3845  KRAS
REFERENCE   PMID:12345678
  AUTHORS   Someone A
///
"""

NETWORK_N2 = """\
ENTRY       N00099            Network
NAME        No-variant network
DEFINITION  A -> B -> C
PATHWAY     hsa00001  Placeholder pathway
///
"""

VAR_3845V1 = """\
ENTRY       3845v1            Variant
NAME        KRAS G12D
GENE        3845  KRAS
VARIATION   dbSNP: rs121913529
            ClinVar: 12582
ORGANISM    Homo sapiens
///
"""

VAR_UNRESOLVED = """\
ENTRY       7157v9            Variant
NAME        TP53 structural variant
VARIATION   dbVar: nsv123456
///
"""

ENSEMBL_RS = {
    "name": "rs121913529",
    "most_severe_consequence": "missense_variant",
    "mappings": [
        {"assembly_name": "GRCh37", "seq_region_name": "12",
         "start": 25398284, "end": 25398284, "allele_string": "C/A/T"},
        {"assembly_name": "GRCh38", "seq_region_name": "12",
         "start": 4, "end": 4, "allele_string": "C/A/T"},
    ],
}

PAGES = {
    f"{KEGG_REST}/list/network": "N00001\tEGF-EGFR-RAS-ERK\nN00099\tNo-variant\n",
    f"{KEGG_REST}/list/disease": "H00014\tGastric cancer\n",
    f"{KEGG_REST}/link/pathway/network":
        "nt06210\tpath:hsa05200\nnt06214\tpath:hsa04010\n",
    f"{KEGG_REST}/get/N00001": NETWORK_N1,
    f"{KEGG_REST}/get/N00099": NETWORK_N2,
    f"{KEGG_REST}/get/hsa_var:3845v1": VAR_3845V1,
    f"{KEGG_REST}/get/hsa_var:7157v9": VAR_UNRESOLVED,
    f"{ENSEMBL_REST}/variation/human/rs121913529"
    "?content-type=application/json": json.dumps(ENSEMBL_RS),
}


class TestParsing:
    def test_flat_fields_and_continuations(self):
        flat = parse_kegg_flat(NETWORK_N1)
        assert flat["ENTRY"].startswith("N00001")
        assert flat["PATHWAY"] == ("hsa05200  Pathways in cancer| "
                                   "hsa04010  MAPK signaling pathway")
        # continuation lines attach to the preceding field, not a new one
        assert "CLASS missing-indent-guard" not in flat
        assert "missing-indent-guard" in flat["EXPANDED"]

    def test_network_entry_keyed_maps(self):
        net = parse_network_entry(NETWORK_N1)
        assert net["entry"] == "N00001"
        assert net["pathway"] == {"hsa05200": "Pathways in cancer",
                                  "hsa04010": "MAPK signaling pathway"}
        assert net["disease"] == {"H00014": "Gastric cancer",
                                  "H00016": "Oral cancer"}
        assert net["gene"] == {"3845": "KRAS"}

    def test_gene_variant_tokens_dedup(self):
        assert gene_variant_tokens(NETWORK_N1) == ["3845v1"]
        assert gene_variant_tokens(NETWORK_N2) == []

    def test_variant_refs_all_sources(self):
        assert extract_variant_refs(VAR_3845V1) == [
            ("dbSNP", "rs121913529"), ("ClinVar", "12582")]
        assert extract_variant_refs(VAR_UNRESOLVED) == [
            ("dbVar", "nsv123456")]


class TestClients:
    def test_kegg_list_link_get(self):
        kegg = KeggClient(canned_transport(PAGES))
        assert kegg.list("network")[0] == ("N00001", "EGF-EGFR-RAS-ERK")
        assert kegg.list("disease") == [("H00014", "Gastric cancer")]
        assert kegg.link("pathway", "network")[0] == ("nt06210",
                                                      "path:hsa05200")
        assert "KRAS G12D" in kegg.get("hsa_var:3845v1")

    def test_ensembl_assembly_pick_and_zero_base(self):
        ens = EnsemblVariationClient(canned_transport(PAGES))
        var = ens.variation("rs121913529")
        assert var["chrom"] == "12"
        assert var["start"] == 3            # GRCh38 mapping, 1-based -> 0
        assert var["ref"] == "C" and var["alts"] == ["A", "T"]

    def test_ensembl_missing_assembly_raises(self):
        ens = EnsemblVariationClient(canned_transport(PAGES),
                                     assembly="T2T-CHM13")
        with pytest.raises(ValueError):
            ens.variation("rs121913529")


class TestDirCache:
    def test_read_through_and_offline_replay(self, tmp_path):
        calls = []

        def inner(url):
            calls.append(url)
            return PAGES[url]

        cache = DirCacheTransport(str(tmp_path), inner=inner)
        url = f"{KEGG_REST}/get/N00001"
        assert cache(url) == NETWORK_N1
        assert cache(url) == NETWORK_N1           # served from disk
        assert calls == [url]
        # a fresh offline transport replays the populated cache
        offline = DirCacheTransport(str(tmp_path))
        assert offline(url) == NETWORK_N1
        with pytest.raises(KeyError):
            offline(f"{KEGG_REST}/get/N99999")

    def test_cache_key_sanitized(self):
        key = cache_key(f"{ENSEMBL_REST}/variation/human/rs1?content-type=x")
        assert "/" not in key and "?" not in key


class TestPipeline:
    def _rows(self):
        t = canned_transport(PAGES)
        return retrieve_network_variant_rows(KeggClient(t),
                                             EnsemblVariationClient(t))

    def test_rows_shape(self):
        rows = self._rows()
        resolved = [r for r in rows if r["chrom"]]
        # dbSNP ref with 2 alts -> 2 rows; ClinVar ref surfaces as unresolved
        assert len(resolved) == 2
        assert {r["alt"] for r in resolved} == {"A", "T"}
        assert resolved[0]["pos"] == 4                 # back to 1-based
        assert resolved[0]["answer"] == "Gastric cancer; Oral cancer"
        assert resolved[0]["network"] == "N00001"
        assert resolved[0]["source"] == "dbSNP"

    def test_windows_end_to_end(self):
        from bioreason_tpu.data.curation import curate_items
        rows = [r for r in self._rows() if r["chrom"]]
        contigs = {"12": "AAACGGGTTT"}                 # ref C at 0-based 3
        items = curate_items(contigs, rows, task="kegg", flank=3)
        assert len(items) == 2
        # extract_window is [pos-flank, pos+flank): AAACGG, offset 3 is C
        assert items[0]["reference_sequence"] == "AAACGG"
        assert {it["variant_sequence"] for it in items} == {"AAAAGG",
                                                            "AAATGG"}

    def test_unresolved_refs_surfaced(self):
        t = canned_transport(PAGES)
        rows = retrieve_network_variant_rows(
            KeggClient(t), EnsemblVariationClient(t),
            network_ids=["N00001"])
        # ClinVar:12582 is not Ensembl-resolvable here but the dbSNP ref
        # resolved the element, so no placeholder row for N00001
        assert all(r["chrom"] for r in rows)

    def test_placeholder_row_when_nothing_resolves(self):
        pages = dict(PAGES)
        pages[f"{KEGG_REST}/get/N00001"] = NETWORK_N1.replace(
            "3845v1", "7157v9")
        pages[f"{KEGG_REST}/get/hsa_var:7157v9"] = VAR_UNRESOLVED
        t = canned_transport(pages)
        rows = retrieve_network_variant_rows(
            KeggClient(t), EnsemblVariationClient(t),
            network_ids=["N00001"])
        assert len(rows) == 1 and rows[0]["chrom"] == ""
        assert rows[0]["unresolved_refs"] == ["dbVar:nsv123456"]


class TestCurateCLI:
    def test_kegg_api_cache_mode(self, tmp_path):
        cache_dir = tmp_path / "cache"
        cache_dir.mkdir()
        for url, body in PAGES.items():
            (cache_dir / cache_key(url)).write_text(body)
        fasta = tmp_path / "genome.fa"
        fasta.write_text(">12\nAAACGGGTTT\n")
        out = tmp_path / "items.jsonl"
        from bioreason_tpu.cli.curate import main
        main(["--fasta", str(fasta), "--kegg_api_cache", str(cache_dir),
              "--flank", "3", "--out", str(out)])
        items = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(items) == 2
        assert all("reference_sequence" in it for it in items)
