import numpy as np

from bioreason_tpu.config import FusionConfig, EncoderConfig, SamplingConfig
from bioreason_tpu.models.api import DnaLLM, DNAClassifier
from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer


def test_dnallm_end_to_end(tmp_path):
    tok = ByteTextTokenizer()
    model = DnaLLM(FusionConfig.tiny(text_vocab=tok.vocab_size,
                                     dna_pad_token_id=tok.dna_pad_id),
                   text_tokenizer=tok)
    texts = ["<|im_start|>user\n<|dna_start|><|dna_pad|><|dna_end|>what?<|im_end|>\n"
             "<|im_start|>assistant\n"]
    dna = [["ACGTACGTACGT"]]
    batch = model.prepare_inputs(texts, dna)
    logits, _ = model(**batch)
    assert logits.shape[0] == 1

    outs = model.generate_text(texts, dna, greedy=True,
                               sampling=SamplingConfig(max_new_tokens=4),
                               max_new_tokens=4)
    assert len(outs) == 1 and isinstance(outs[0], str)

    path = str(tmp_path / "m")
    model.save(path)
    model2 = DnaLLM(model.cfg, text_tokenizer=tok).load(path)
    l2, _ = model2(**batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(l2), atol=1e-5)


def test_classifier_predict():
    clf = DNAClassifier(EncoderConfig.tiny(), num_classes=3)
    preds = clf.predict(["ACGTACGTACGT", "ACGT"], ["ACGTACGAACGT", "TTTT"],
                        max_length=16)
    assert preds.shape == (2,)
    assert set(preds).issubset({0, 1, 2})
