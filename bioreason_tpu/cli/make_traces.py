"""Generate reasoning traces for curated variant rows — locally.

The reference's `BioReasoning_DataCuration_KEGG.ipynb` does this with the
Anthropic API (batched requests, temperature 0.2, "VALID JSON only");
here the traces come from either a deterministic template or the repo's
own generation engine driving any local checkpoint, with optional guided
decoding pinning the output to the JSON skeleton (data/traces.py).

    # offline, zero-model (always available):
    python -m bioreason_tpu.cli.make_traces \
        --tsv final_network_with_variant.tsv --out analyses.json

    # with a trained checkpoint:
    python -m bioreason_tpu.cli.make_traces --tsv ... --backend engine \
        --hf_llm_dir Qwen/Qwen3-0.6B-local --checkpoint runs/sft/final \
        --out analyses.json --items_out kegg_items.jsonl

`--items_out` additionally writes the analyses as KEGG-dataset items
(question/answer/reasoning) ready for cli.train_sft --dataset kegg.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tsv", required=True,
                   help="KEGG network-with-variant TSV (Var_ID, ENTRY, Chr, "
                        "Start, RefAllele, AltAllele, Network Definition, "
                        "Gene, Disease columns)")
    p.add_argument("--out", required=True,
                   help="combined analyses JSON (all_variant_analyses.json "
                        "equivalent)")
    p.add_argument("--items_out", default=None,
                   help="also write KEGG-format items JSONL for SFT")
    p.add_argument("--backend", default="template",
                   choices=["template", "engine"])
    p.add_argument("--num", type=int, default=None,
                   help="process only the first N rows")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--answer_col", default=None,
                   help="TSV column holding a curated ground-truth answer "
                        "to rationalize (teacher forcing)")
    p.add_argument("--guided_json", action="store_true",
                   help="constrain engine output to the JSON skeleton via "
                        "guided decoding")
    # engine-backend model source (same flags as the other CLIs)
    p.add_argument("--decoder", default="qwen3-0.6b")
    p.add_argument("--encoder", default="nt-500m")
    p.add_argument("--hf_llm_dir", default=None)
    p.add_argument("--hf_dna_dir", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="Orbax SFT/GRPO checkpoint to generate with")
    p.add_argument("--frozen", default="int8",
                   choices=["bfloat16", "int8"],
                   help="engine-weight storage (int8 = serving config)")
    args = p.parse_args(argv)

    from bioreason_tpu.data import traces

    rows = traces.load_variant_tsv(args.tsv)
    if args.num is not None:
        rows = rows[:args.num]
    answers = ([r.get(args.answer_col, "") for r in rows]
               if args.answer_col else None)
    print(f"loaded {len(rows)} variant rows from {args.tsv}")

    if args.backend == "template":
        analyses = traces.generate_analyses(rows, backend="template",
                                            known_answers=answers)
    else:
        analyses = _engine_analyses(args, rows, answers)

    traces.combine_analyses(analyses, args.out)
    from collections import Counter
    counts = Counter(a["backend"] for a in analyses)
    print(f"wrote {len(analyses)} analyses to {args.out} "
          f"({dict(counts)})")
    if args.items_out:
        with open(args.items_out, "w", encoding="utf-8") as f:
            for a in analyses:
                f.write(json.dumps(traces.analysis_to_item(a)) + "\n")
        print(f"wrote KEGG items to {args.items_out}")


def _engine_analyses(args, rows, answers):
    import jax
    from bioreason_tpu.cli.common import DECODER_PRESETS, ENCODER_PRESETS
    from bioreason_tpu.config import FusionConfig, SamplingConfig
    from bioreason_tpu.data import (BioProcessor, ByteTextTokenizer,
                                    KmerTokenizer)
    from bioreason_tpu.data import traces
    from bioreason_tpu.generate.engine import GenerationEngine
    from bioreason_tpu.models import init_fusion

    if args.hf_llm_dir:
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        if not args.hf_dna_dir:
            raise SystemExit("--hf_llm_dir requires --hf_dna_dir")
        fusion, params, tok, dna_tok = load_pretrained_fusion(
            args.hf_llm_dir, args.hf_dna_dir)
        processor = BioProcessor(tok, dna_tok)
    else:
        tok = ByteTextTokenizer()
        processor = BioProcessor(tok, KmerTokenizer())
        fusion = FusionConfig(
            decoder=DECODER_PRESETS[args.decoder](vocab_size=tok.vocab_size),
            encoder=ENCODER_PRESETS[args.encoder](),
            dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), fusion)
    if args.checkpoint:
        from bioreason_tpu.train.checkpoint import load_checkpoint
        params = load_checkpoint(args.checkpoint, like=params)
    if args.frozen == "int8":
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = jax.jit(
            lambda p: quantize_frozen_int8(p, include_embed=True,
                                           xp=jax.numpy))(params)
    eos = processor.text_tokenizer.eos_token_id
    engine = GenerationEngine(fusion, eos_token_id=eos)
    guided = None
    if args.guided_json:
        from bioreason_tpu.generate.guided import guided_spec_for
        guided = guided_spec_for(processor.text_tokenizer,
                                 traces.guided_regex_for_analysis())
    return traces.generate_analyses(
        rows, backend="engine", known_answers=answers, engine=engine,
        params=params, processor=processor,
        sampling=SamplingConfig(temperature=0.2, top_k=50, top_p=0.95),
        max_new_tokens=args.max_new_tokens, batch_size=args.batch_size,
        guided=guided)


if __name__ == "__main__":
    main()
