import numpy as np

from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer
from bioreason_tpu.data.processor import BioProcessor
from bioreason_tpu.data.collate import sft_collate, classifier_collate, IGNORE_INDEX
from bioreason_tpu.data.kegg import format_kegg_for_dna_llm, synthetic_kegg_items
from bioreason_tpu.data.utils import truncate_dna, split_dataset


def make_processor():
    return BioProcessor(ByteTextTokenizer(), KmerTokenizer())


class TestProcessor:
    def test_dna_pad_expansion_matches_nonpad_counts(self):
        p = make_processor()
        text = ["<|dna_start|><|dna_pad|><|dna_end|><|dna_start|><|dna_pad|><|dna_end|>question"]
        dna = [["ACGTACGTACGT", "ACGTAC"]]  # 2+1 tokens, 1+1 with CLS -> 3 and 2
        out = p(text=text, batch_dna_sequences=dna, max_length_text=64, max_length_dna=32)
        n_pads = int((out.input_ids == p.text_tokenizer.dna_pad_id).sum())
        n_dna = int((out.dna_input_ids != p.dna_tokenizer.pad_id).sum())
        assert n_pads == n_dna == 3 + 2  # includes CLS tokens, like the reference

    def test_batch_idx_map_flattening(self):
        p = make_processor()
        text = ["<|dna_pad|>a", "<|dna_pad|><|dna_pad|>b"]
        dna = [["ACGTAC"], ["ACGTAC", "ACGTACGTACGT"]]
        out = p(text=text, batch_dna_sequences=dna, max_length_text=64, max_length_dna=32)
        # ragged counts are uniformized with all-pad dummy rows (batch-major)
        assert out.batch_idx_map == [0, 0, 1, 1]
        assert out.dna_input_ids.shape[0] == 4
        # the dummy row contributes zero valid tokens
        assert out.dna_attention_mask[1].sum() == 0
        # splice invariant still holds
        n_pads = int((out.input_ids == p.text_tokenizer.dna_pad_id).sum())
        assert n_pads == int((out.dna_input_ids != p.dna_tokenizer.pad_id).sum())

    def test_left_padding_text(self):
        p = make_processor()
        out = p(text=["aa", "aaaa"], batch_dna_sequences=None, max_length_text=32, max_length_dna=0)
        assert out.attention_mask[0].tolist()[:2] == [0, 0]

    def test_expansion_per_item_consumes_in_order(self):
        p = make_processor()
        # two items, one sequence each with different lengths
        text = ["<|dna_pad|>x", "<|dna_pad|>y"]
        dna = [["ACGTACGTACGT"], ["ACGTAC"]]
        out = p(text=text, batch_dna_sequences=dna, max_length_text=64, max_length_dna=32)
        per_row = (out.input_ids == p.text_tokenizer.dna_pad_id).sum(axis=1)
        assert per_row.tolist() == [3, 2]


class TestSFTCollate:
    def test_labels_cover_assistant_only(self):
        p = make_processor()
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(2, seq_len=24)]
        batch = sft_collate(items, p, max_length_text=512, max_length_dna=64)
        tok = p.text_tokenizer
        for i in range(2):
            ids, labels = batch["input_ids"][i], batch["labels"][i]
            sup = labels != IGNORE_INDEX
            assert sup.any()
            text = tok.decode(ids[sup], skip_special_tokens=False)
            assert text.startswith("<think>")
            assert "Answer:" in text
            # user-side tokens (dna pads, question) are not supervised
            assert not np.any(ids[sup] == tok.dna_pad_id)
        # supervised tokens equal the input ids there
        sup = batch["labels"] != IGNORE_INDEX
        assert np.array_equal(batch["labels"][sup], batch["input_ids"][sup])

    def test_pads_are_ignored(self):
        p = make_processor()
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(2, seq_len=24, seed=3)]
        batch = sft_collate(items, p, max_length_text=512, max_length_dna=64)
        pad_positions = batch["input_ids"] == p.text_tokenizer.pad_token_id
        assert np.all(batch["labels"][pad_positions] == IGNORE_INDEX)

    def test_supervise_eos_includes_final_im_end(self):
        p = make_processor()
        tok = p.text_tokenizer
        items = [format_kegg_for_dna_llm(it)
                 for it in synthetic_kegg_items(2, seq_len=24, seed=5)]
        batch = sft_collate(items, p, max_length_text=512, max_length_dna=64,
                            supervise_eos=True)
        for i in range(2):
            ids, labels = batch["input_ids"][i], batch["labels"][i]
            sup = labels != IGNORE_INDEX
            text = tok.decode(ids[sup], skip_special_tokens=False)
            # final <|im_end|> IS supervised; span still assistant-only
            assert text.startswith("<think>")
            assert text.endswith("<|im_end|>")
            assert text.count("<|im_end|>") == 1
            # the supervised eos is the LAST attended token of the row
            last_attended = np.nonzero(batch["attention_mask"][i])[0][-1]
            assert sup[last_attended]
            assert ids[last_attended] == tok.eos_token_id
        # left padding (pad id == eos id) stays unsupervised
        pad_cols = batch["attention_mask"] == 0
        assert np.all(batch["labels"][pad_cols] == IGNORE_INDEX)

    def test_teacher_forced_probe_markers(self):
        import jax
        from bioreason_tpu.config import FusionConfig
        from bioreason_tpu.models import init_fusion
        from bioreason_tpu.train.eval import teacher_forced_probe

        p = make_processor()
        p2 = BioProcessor(ByteTextTokenizer(), KmerTokenizer(kmer=1))
        tok = p2.text_tokenizer
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(
            4, seq_len=24, seed=9, learnable=True, fixed_positions=True)]
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        out = teacher_forced_probe(
            params, cfg, p2, items,
            markers={"base": "substitutes ", "half": " in the ",
                     "answer": "Answer: "},
            batch_size=4, max_length_text=512, max_length_dna=32)
        # every marker occurs in every learnable item; random model ~ chance
        for key in ("base_acc", "half_acc", "answer_acc", "span_acc"):
            assert 0.0 <= out[key] <= 1.0
        assert out["span_acc"] < 0.5   # untrained model can't fit the span

    def test_bucketing_rounds_widths(self):
        p = make_processor()
        items = [format_kegg_for_dna_llm(it) for it in synthetic_kegg_items(2, seq_len=24, seed=1)]
        batch = sft_collate(items, p, max_length_text=512, max_length_dna=64, bucket=128)
        assert batch["input_ids"].shape[1] % 128 == 0
        assert batch["dna_input_ids"].shape[1] % 128 == 0
        # splice invariant survives bucketing
        n_pads = int((batch["input_ids"] == p.text_tokenizer.dna_pad_id).sum())
        n_dna = int((batch["dna_input_ids"] != p.dna_tokenizer.pad_id).sum())
        assert n_pads == n_dna


class TestClassifierCollate:
    def test_shapes_and_labels(self):
        items = synthetic_kegg_items(4, seq_len=32, seed=2)
        labels = sorted({it["answer"] for it in items})
        label2id = {l: i for i, l in enumerate(labels)}
        batch = classifier_collate(items, KmerTokenizer(), label2id, max_length=64)
        assert batch["ref_ids"].shape == batch["alt_ids"].shape
        assert batch["labels"].shape == (4,)
        assert batch["labels"].max() < len(labels)


class TestDatasetUtils:
    def test_truncate_dna(self):
        ex = {"reference_sequence": "A" * 100, "variant_sequence": "C" * 20}
        out = truncate_dna(dict(ex), truncate_dna_per_side=10)
        assert len(out["reference_sequence"]) == 80
        assert out["variant_sequence"] == "C" * 20  # too short -> untouched

    def test_truncate_dna_zero_is_noop(self):
        """Regression: per_side=0 must keep sequences whole — the naive
        seq[0:-0] slice silently EMPTIES them (r4 rehearsal root cause)."""
        ex = {"reference_sequence": "A" * 100, "variant_sequence": "C" * 20}
        out = truncate_dna(dict(ex), truncate_dna_per_side=0)
        assert out["reference_sequence"] == "A" * 100
        assert out["variant_sequence"] == "C" * 20

    def test_split_ratios_and_determinism(self):
        items = list(range(100))
        tr, va, te = split_dataset(items, seed=42)
        assert len(tr) == 80 and len(va) == 10 and len(te) == 10
        tr2, _, _ = split_dataset(items, seed=42)
        assert tr == tr2
        assert sorted(tr + va + te) == items


class TestRaggedFusion:
    def test_uniformized_ragged_batch_runs_fusion(self):
        import jax.numpy as jnp
        from bioreason_tpu.config import FusionConfig
        from bioreason_tpu.models import init_fusion, fusion_forward, validate_splice
        import jax as _jax

        p = make_processor()
        tok = p.text_tokenizer
        text = ["<|dna_pad|>question one", "<|dna_pad|><|dna_pad|>question two"]
        dna = [["ACGTACGTACGT"], ["ACGTAC", "ACGTACGTACGTACGTAC"]]
        out = p(text=text, batch_dna_sequences=dna, max_length_text=64, max_length_dna=32)
        validate_splice(out.input_ids, out.dna_input_ids, tok.dna_pad_id)
        assert out.dna_input_ids.shape[0] == 4  # uniformized to 2/item

        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(_jax.random.PRNGKey(0), cfg)
        logits, _ = fusion_forward(params, cfg, jnp.asarray(out.input_ids),
                                   jnp.asarray(out.attention_mask),
                                   jnp.asarray(out.dna_input_ids),
                                   jnp.asarray(out.dna_attention_mask))
        assert np.isfinite(np.asarray(logits)).all()
