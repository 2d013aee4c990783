"""ctypes bindings for the native tokenization kernels (native/fast_tokenizers.cpp).

Falls back to the pure-Python tokenizers when the shared library is absent.
`KmerTokenizer`/`CharDNATokenizer` route their batch `__call__` through these
kernels automatically when available AND when using the default vocab layout
(custom vocab files keep the Python path, which handles arbitrary vocabs).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libfast_tokenizers.so"),
        os.path.join(os.path.dirname(__file__), "libfast_tokenizers.so"),
        os.environ.get("BIOREASON_NATIVE_LIB", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.nt_tokenize_batch.restype = ctypes.c_int32
        lib.nt_tokenize_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.nt_count_tokens.restype = ctypes.c_int32
        lib.nt_count_tokens.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.char_tokenize_batch.restype = ctypes.c_int32
        lib.char_tokenize_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _pack(sequences: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    blobs = [s.encode("ascii", errors="replace") for s in sequences]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    return b"".join(blobs), offsets


def nt_tokenize_batch_native(sequences: Sequence[str], max_length: int,
                             padding_side: str = "right",
                             pad_to: Optional[int] = None):
    """Returns dict(input_ids, attention_mask) or None if lib unavailable."""
    lib = get_lib()
    if lib is None or not sequences:
        return None
    data, offsets = _pack(sequences)
    n = len(sequences)
    if pad_to is not None:
        width = pad_to
    else:
        width = 0
        for i in range(n):
            cnt = lib.nt_count_tokens(data[offsets[i]:offsets[i + 1]],
                                      offsets[i + 1] - offsets[i], max_length, 1)
            width = max(width, cnt)
        width = max(width, 1)
    ids = np.empty((n, width), np.int32)
    mask = np.empty((n, width), np.int32)
    lib.nt_tokenize_batch(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        width, min(max_length, width), 1, 1 if padding_side == "left" else 0)
    return {"input_ids": ids, "attention_mask": mask}


def char_tokenize_batch_native(sequences: Sequence[str], max_length: Optional[int],
                               pad_id: int, padding_side: str = "left",
                               pad_to: Optional[int] = None):
    lib = get_lib()
    if lib is None or not sequences:
        return None
    data, offsets = _pack(sequences)
    n = len(sequences)
    lens = np.diff(offsets)
    eff = lens if max_length is None else np.minimum(lens, max_length)
    width = int(pad_to if pad_to is not None else max(int(eff.max()), 1))
    ids = np.empty((n, width), np.int32)
    mask = np.empty((n, width), np.int32)
    lib.char_tokenize_batch(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        width, max_length if max_length is not None else width, pad_id,
        1 if padding_side == "left" else 0)
    return {"input_ids": ids, "attention_mask": mask}
