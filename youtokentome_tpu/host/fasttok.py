"""ctypes wrapper for the native tokenizer (fasttok.cpp).

Compiled on demand next to the source; ``available()`` reports whether
the native path can be used (callers fall back to the pure array
pipeline otherwise).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "_fasttok.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            src = _HERE / "fasttok.cpp"
            if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++11",
                     str(src), "-o", str(_SO)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO))
            lib.yttm_tokenize.restype = None
            lib.yttm_tokenize.argtypes = [
                ctypes.c_void_p, ctypes.c_long,           # data, n
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,  # alphabet
                ctypes.c_int32,                            # space_id
                ctypes.c_void_p, ctypes.c_long,            # words_flat
                ctypes.c_void_p, ctypes.c_long,            # word_off / uniq_cap
                ctypes.c_void_p, ctypes.c_long,            # occ_stream
                ctypes.c_void_p,                           # uid_counts
                ctypes.c_void_p,                           # out
            ]
            lib.yttm_expand_format.restype = ctypes.c_long
            lib.yttm_expand_format.argtypes = [
                ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_long,
            ]
            lib.yttm_expand_ids.restype = ctypes.c_long
            lib.yttm_expand_ids.argtypes = [
                ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_long,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def tokenize(
    data: bytes, alpha_cps: np.ndarray, alpha_ids: np.ndarray, space_id: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (words_flat, word_off [U+1], occ_stream, uid_counts)."""
    lib = _load()
    assert lib is not None
    n = len(data)
    words_cap = (3 * n) // 2 + 16
    uniq_cap = n // 2 + 4
    occ_cap = n + 4
    words_flat = np.empty(words_cap, np.int32)
    word_off = np.empty(uniq_cap + 1, np.int32)
    occ = np.empty(occ_cap, np.int32)
    counts = np.empty(uniq_cap, np.int64)
    out = np.zeros(4, np.int64)
    cps = np.ascontiguousarray(alpha_cps, dtype=np.uint32)
    ids = np.ascontiguousarray(alpha_ids, dtype=np.int32)
    lib.yttm_tokenize(
        ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p), n,
        cps.ctypes.data_as(ctypes.c_void_p),
        ids.ctypes.data_as(ctypes.c_void_p), cps.size,
        space_id,
        words_flat.ctypes.data_as(ctypes.c_void_p), words_cap,
        word_off.ctypes.data_as(ctypes.c_void_p), uniq_cap,
        occ.ctypes.data_as(ctypes.c_void_p), occ_cap,
        counts.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if out[3] != 0:
        raise RuntimeError("fasttok capacity exceeded")
    n_flat, n_uniq, n_occ = int(out[0]), int(out[1]), int(out[2])
    return (
        words_flat[:n_flat],
        word_off[: n_uniq + 1],
        occ[:n_occ],
        counts[:n_uniq],
    )


def expand_format(
    occ: np.ndarray, results_flat: np.ndarray, res_off: np.ndarray
) -> bytes:
    lib = _load()
    assert lib is not None
    occ = np.ascontiguousarray(occ, np.int32)
    rf = np.ascontiguousarray(results_flat, np.int32)
    ro = np.ascontiguousarray(res_off, np.int32)
    # bound: every token prints <= 12 bytes + separator
    lens = np.diff(ro.astype(np.int64))
    cap = 13 * int(lens[occ[occ >= 0]].sum()) + occ.size + 64
    buf = np.empty(cap, dtype=np.uint8)  # no zeroing, unlike create_string_buffer
    k = lib.yttm_expand_format(
        occ.ctypes.data_as(ctypes.c_void_p), occ.size,
        rf.ctypes.data_as(ctypes.c_void_p), ro.ctypes.data_as(ctypes.c_void_p),
        buf.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if k < 0:
        raise RuntimeError("expand_format capacity")
    return buf[:k].tobytes()


def expand_ids(
    occ: np.ndarray, results_flat: np.ndarray, res_off: np.ndarray
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    occ = np.ascontiguousarray(occ, np.int32)
    rf = np.ascontiguousarray(results_flat, np.int32)
    ro = np.ascontiguousarray(res_off, np.int32)
    lens = np.diff(ro)
    cap = int(lens[occ[occ >= 0]].sum()) + occ.size + 4
    out = np.empty(cap, np.int32)
    k = lib.yttm_expand_ids(
        occ.ctypes.data_as(ctypes.c_void_p), occ.size,
        rf.ctypes.data_as(ctypes.c_void_p), ro.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if k < 0:
        raise RuntimeError("expand_ids capacity")
    return out[:k]
