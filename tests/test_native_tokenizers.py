"""Native C kernels must agree byte-for-byte with the Python tokenizers."""

import subprocess
import os

import numpy as np
import pytest

from bioreason_tpu.data import native
from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native", "libfast_tokenizers.so")


@pytest.fixture(scope="module", autouse=True)
def ensure_lib():
    if not os.path.exists(LIB):
        subprocess.run(["make"], cwd=os.path.dirname(LIB), check=True)
    native._TRIED = False
    native._LIB = None
    assert native.get_lib() is not None, "native lib failed to load"


def _python_kmer(seqs, **kw):
    tok = KmerTokenizer()
    tok._default_layout = False  # force python path
    return tok(seqs, **kw)


SEQS = ["ACGTACGTACGT", "ACGTAC", "ACNACGTACGNN", "", "A" * 50,
        "ACGT" * 200, "NNNNNN", "ACGTACG"]


@pytest.mark.parametrize("padding_side", ["right", "left"])
@pytest.mark.parametrize("max_length", [4, 32, 2048])
def test_kmer_native_matches_python(padding_side, max_length):
    py = _python_kmer(SEQS, max_length=max_length, padding_side=padding_side)
    nat = KmerTokenizer()(SEQS, max_length=max_length, padding_side=padding_side)
    np.testing.assert_array_equal(py["input_ids"], nat["input_ids"])
    np.testing.assert_array_equal(py["attention_mask"], nat["attention_mask"])


def test_kmer_native_pad_to():
    py = _python_kmer(SEQS, max_length=16, pad_to=64)
    nat = KmerTokenizer()(SEQS, max_length=16, pad_to=64)
    np.testing.assert_array_equal(py["input_ids"], nat["input_ids"])


def test_char_native_matches_python():
    tok = CharDNATokenizer()
    seqs = ["ACGT", "AC", "", "ACGTACGTAC"]
    nat = tok(seqs, max_length=6)
    # python path: force by non-ascii trick not needed; construct manually
    ids = [tok.encode(s)[:6] for s in seqs]
    width = max(len(i) for i in ids)
    exp = np.full((len(ids), width), tok.pad_id, np.int32)
    msk = np.zeros_like(exp)
    for r, e in enumerate(ids):
        exp[r, width - len(e):] = e
        msk[r, width - len(e):] = 1
    np.testing.assert_array_equal(nat["input_ids"], exp)
    np.testing.assert_array_equal(nat["attention_mask"], msk)
