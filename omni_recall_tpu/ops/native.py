"""ctypes loader for the native (C) keyword rescorer.

Compiles native/keyword_scorer.c on first use (cached next to the source as
``libomni_keyword.so``) and exposes ``keyword_scores(terms, contents)``.
Falls back to the pure-Python scorer when no C toolchain is available —
behavior is identical (tested in tests/test_native.py), only slower.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

logger = logging.getLogger(__name__)

_SOURCE = Path(__file__).resolve().parent.parent.parent / "native" / "keyword_scorer.c"
_LIB_PATH = _SOURCE.with_name("libomni_keyword.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_SOURCE)],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError) as exc:
            logger.debug("native build with %s failed: %s", cc, exc)
    return False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not _LIB_PATH.is_file() or _LIB_PATH.stat().st_mtime < _SOURCE.stat().st_mtime:
                if not _build():
                    _load_failed = True
                    logger.info("native keyword scorer unavailable; using Python fallback")
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.keyword_scores.restype = ctypes.c_int
            lib.keyword_scores.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.keyword_scores_multi.restype = ctypes.c_int
            lib.keyword_scores_multi.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.c_long,
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.chunk_signatures.restype = ctypes.c_int
            lib.chunk_signatures.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            _lib = lib
        except OSError as exc:
            logger.info("native keyword scorer load failed (%s); Python fallback", exc)
            _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def keyword_scores(terms_utf8: list[bytes], contents_utf8: list[bytes]) -> list[float] | None:
    """Exact keyword scores for each content; None if the native lib is
    unavailable (caller falls back to Python). Inputs must be lowercased
    UTF-8; whitespace-only contents must be pre-filtered by the caller
    (the engine handles the reference's IsNullOrWhiteSpace guard)."""
    lib = _load()
    if lib is None:
        return None
    n_c, n_t = len(contents_utf8), len(terms_utf8)
    out = (ctypes.c_double * n_c)()
    if n_c == 0:
        return []
    contents_arr = (ctypes.c_char_p * n_c)(*contents_utf8)
    content_lens = (ctypes.c_long * n_c)(*[len(c) for c in contents_utf8])
    terms_arr = (ctypes.c_char_p * max(1, n_t))(*(terms_utf8 or [b""]))
    term_lens = (ctypes.c_long * max(1, n_t))(*([len(t) for t in terms_utf8] or [0]))
    rc = lib.keyword_scores(
        contents_arr, content_lens, n_c, terms_arr, term_lens, n_t, out
    )
    if rc != 0:
        return None
    return list(out)


def chunk_signatures(
    contents_ascii_utf8: list[bytes], bloom_bits: int, ngram: int, n_hashes: int
):
    """Packed bloom signatures for ASCII contents (byte-level grams equal
    the Python character-level grams only for ASCII — the caller must route
    non-ASCII content to the Python builder). Returns u8[n, bloom_bits//8]
    or None if the native lib is unavailable."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    n = len(contents_ascii_utf8)
    w = bloom_bits // 8
    out = np.zeros((n, w), dtype=np.uint8)
    if n == 0:
        return out
    contents_arr = (ctypes.c_char_p * n)(*contents_ascii_utf8)
    content_lens = (ctypes.c_long * n)(*[len(c) for c in contents_ascii_utf8])
    rc = lib.chunk_signatures(
        contents_arr, content_lens, n, bloom_bits, ngram, n_hashes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        return None
    return out


def keyword_scores_multi(
    contents_utf8: list[bytes],
    content_query: list[int],
    terms_utf8: list[bytes],
    term_offsets: list[int],
) -> list[float] | None:
    """Batched multi-query exact keyword scores: content i is scored against
    the terms slice [term_offsets[q], term_offsets[q+1]) of its query
    q = content_query[i]. None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_c = len(contents_utf8)
    n_q = len(term_offsets) - 1
    if n_c == 0:
        return []
    out = (ctypes.c_double * n_c)()
    contents_arr = (ctypes.c_char_p * n_c)(*contents_utf8)
    content_lens = (ctypes.c_long * n_c)(*[len(c) for c in contents_utf8])
    cq = (ctypes.c_long * n_c)(*content_query)
    n_t = len(terms_utf8)
    terms_arr = (ctypes.c_char_p * max(1, n_t))(*(terms_utf8 or [b""]))
    term_lens = (ctypes.c_long * max(1, n_t))(*([len(t) for t in terms_utf8] or [0]))
    offs = (ctypes.c_long * (n_q + 1))(*term_offsets)
    rc = lib.keyword_scores_multi(
        contents_arr, content_lens, cq, n_c, terms_arr, term_lens, offs, n_q, out
    )
    if rc != 0:
        return None
    return list(out)
