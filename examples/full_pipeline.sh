#!/usr/bin/env bash
# End-to-end BioReason-equivalent pipeline on synthetic data, runnable on a
# CPU-only box (8 virtual devices) or unchanged on a real TPU (drop
# --cpu_devices). Mirrors the reference's workflow:
#   curate -> SFT (train_dna_qwen) -> generative eval -> GRPO (reason.py)
#   -> serve.
# With real assets, swap in --data_dir <your jsonl>, --hf_llm_dir/--hf_dna_dir
# (see MIGRATION.md).
set -euo pipefail
OUT=${OUT:-/tmp/bioreason_pipeline}
DEV=${DEV:---cpu_devices 8}
mkdir -p "$OUT"

echo "== 1. SFT (LoRA) on synthetic KEGG-shaped data =="
python -m bioreason_tpu.cli.train_sft --decoder tiny --encoder tiny $DEV \
    --batch_size 4 --max_length_dna 128 --max_length_text 384 --max_steps 8 \
    --n_synthetic 32 --sample_every 8 \
    --checkpoint_dir "$OUT/sft" --log_dir "$OUT/logs_sft"

echo "== 2. Generative test epoch (substring-match metrics) =="
python -m bioreason_tpu.cli.train_sft --decoder tiny --encoder tiny $DEV \
    --batch_size 4 --max_length_dna 128 --max_length_text 384 --max_steps 1 \
    --n_synthetic 32 --test_generative --max_new_tokens 24 \
    --checkpoint_dir "$OUT/sft_eval" --log_dir "$OUT/logs_eval"

echo "== 3. GRPO RL on top of the SFT checkpoint =="
python -m bioreason_tpu.cli.reason --decoder tiny --encoder tiny $DEV \
    --num_generations 2 --batch_size 4 --max_steps 3 \
    --max_completion_length 24 --max_length_dna 128 \
    --reward_funcs xmlcount correctness \
    --sft_checkpoint "$OUT/sft/sft_final" \
    --checkpoint_dir "$OUT/grpo" --log_dir "$OUT/logs_grpo"

echo "== 4. DNA-only classifier baseline =="
python -m bioreason_tpu.cli.train_dna_only --encoder tiny $DEV \
    --batch_size 4 --max_steps 5 --max_length_dna 128 \
    --log_dir "$OUT/logs_clf"

echo "== 5. Serve the SFT model (3s smoke) =="
python - <<'EOF'
import threading, time, json, urllib.request
from bioreason_tpu.utils import force_cpu_devices
force_cpu_devices(2)
import jax
from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
from bioreason_tpu.models import init_fusion
from bioreason_tpu.serve import InferenceServer, make_http_server

tok = ByteTextTokenizer()
cfg = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
srv = InferenceServer(init_fusion(jax.random.PRNGKey(0), cfg), cfg,
                      BioProcessor(tok, KmerTokenizer()),
                      sampling=SamplingConfig(max_new_tokens=8),
                      max_new_tokens=8, greedy_default=True).start()
httpd = make_http_server(srv, port=0)
port = httpd.server_address[1]
threading.Thread(target=httpd.serve_forever, daemon=True).start()
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/generate",
    json.dumps({"question": "Which pathway is affected?",
                "reference_sequence": "ACGTACGTACGT",
                "variant_sequence": "ACGAACGTACGT"}).encode(),
    {"Content-Type": "application/json"})
print("serve response:", json.load(urllib.request.urlopen(req, timeout=600)))
httpd.shutdown(); srv.stop()
EOF

echo "== 6. VEP curation -> SFT -> generative eval (both ClinVar tasks) =="
# synthetic mini-genome + ClinVar-style variant table (the offline tail of
# the Clinvar_Coding / Clinvar_SNV_Non_SNV notebooks)
python - <<'EOF'
import random
random.seed(0)
seq = "".join(random.choice("ACGT") for _ in range(4000))
with open("/tmp/bioreason_pipeline_genome.fa", "w") as f:
    f.write(">chr1\n")
    for i in range(0, len(seq), 80):
        f.write(seq[i:i+80] + "\n")
cols = ["Chromosome", "PositionVCF", "ReferenceAlleleVCF",
        "AlternateAlleleVCF", "ClinicalSignificance", "GeneSymbol", "Type"]
rows = []
for i in range(24):
    pos = 200 + i * 150
    ref = seq[pos - 1]
    alt = random.choice([b for b in "ACGT" if b != ref])
    sig = "Pathogenic; risk factor" if i % 2 else "Benign"
    if i % 3 == 2:     # every third row: a small deletion (non-SNV class)
        ref, alt, vtype = seq[pos - 1:pos + 2], seq[pos - 1], "Deletion"
    else:
        vtype = "single nucleotide variant"
    rows.append([f"chr1", str(pos), ref, alt, sig, f"GENE{i%4}", vtype])
with open("/tmp/bioreason_pipeline_clinvar.tsv", "w") as f:
    f.write("\t".join(cols) + "\n")
    for r in rows:
        f.write("\t".join(r) + "\n")
EOF
for TASK in variant_effect_coding variant_effect_non_snv; do
  python -m bioreason_tpu.cli.curate --clinvar \
      --fasta /tmp/bioreason_pipeline_genome.fa \
      --variants /tmp/bioreason_pipeline_clinvar.tsv \
      --task "$TASK" --flank 120 --out "$OUT/$TASK.jsonl"
  python -m bioreason_tpu.cli.train_sft --decoder tiny --encoder tiny $DEV \
      --dataset_type "$TASK" --data_dir "$OUT/$TASK.jsonl" \
      --batch_size 2 --max_length_dna 128 --max_length_text 384 \
      --max_steps 4 --test_generative --max_new_tokens 16 \
      --checkpoint_dir "$OUT/sft_$TASK" --log_dir "$OUT/logs_$TASK"
done

echo "== 7. KEGG reasoning-trace generation -> SFT items =="
# the local rebuild of BioReasoning_DataCuration_KEGG.ipynb (API-driven
# trace generation): variant TSV -> analyses JSON -> KEGG items JSONL
python - <<'EOF'
import json
cols = ["Var_ID", "ENTRY", "Chr", "Start", "RefAllele", "AltAllele",
        "Network Definition", "Gene", "Disease"]
rows = [
    ["rs1", "hsa:3845", "12", "25245350", "C", "T",
     "EGFR-RAS-RAF signaling", json.dumps({"hsa:3845": "KRAS; GTPase"}),
     json.dumps({"Pancreatic cancer": "H00018"})],
    ["rs2", "hsa:7157", "17", "7674220", "G", "A",
     "p53 DNA damage response", json.dumps({"hsa:7157": "TP53; tumor protein"}),
     json.dumps({"Li-Fraumeni syndrome": "H00881"})],
]
with open("/tmp/bioreason_pipeline_kegg.tsv", "w") as f:
    f.write("\t".join(cols) + "\n")
    for r in rows:
        f.write("\t".join(r) + "\n")
EOF
python -m bioreason_tpu.cli.make_traces \
    --tsv /tmp/bioreason_pipeline_kegg.tsv \
    --out "$OUT/all_variant_analyses.json" \
    --items_out "$OUT/kegg_traced_items.jsonl"
python - "$OUT/all_variant_analyses.json" <<'EOF'
import json, sys
data = json.load(open(sys.argv[1]))
assert len(data) == 2 and all(
    8 <= len(a["reasoning"]["reasoning_steps"]) <= 12 for a in data)
print("traces ok:", [a["reasoning"]["variant_id"] for a in data])
EOF

echo "== pipeline complete; artifacts in $OUT =="
