"""Native C++ CPU beam-search engine (ctypes wrapper).

Exact-semantics CPU implementation of the reference decoder (see
radian_tpu/native/beamsearch.cc) for CPU serving and as a fast oracle —
~100× the reference's pure-python loop, OpenMP-parallel across reads.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is None:
        from radian_tpu.native import build_library

        path = build_library("beamsearch", extra_flags=["-fopenmp"])
        lib = ctypes.CDLL(str(path))
        lib.BeamSearchBatch.restype = None
        lib.BeamSearchBatch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    return _lib


def beam_search_native(
    mats: np.ndarray,
    lengths: np.ndarray,
    beam_width: int = 6,
    lm=None,
    s_threshold: float = 0.5,
    r_threshold: float = 0.5,
    ctx_len: int = 11,
):
    """Decode ``[N, T, 5]`` probability matrices on the CPU.

    Returns ``(rev_labels [N, T] int8 — reversed labels, -1 padded,
    n_labels [N], scores [N])`` matching ``beam_search_batch`` semantics.
    ``lm`` is a ``KmerLM`` or None.
    """
    lib = _load()
    mats = np.ascontiguousarray(mats, np.float32)
    n, t, c5 = mats.shape
    lengths = np.ascontiguousarray(lengths, np.int32)
    out_rev = np.full((n, t), -1, np.int8)
    out_lens = np.zeros(n, np.int64)
    out_scores = np.zeros(n, np.float64)

    if lm is not None:
        if lm.context_len != ctx_len:
            raise ValueError("lm context_len mismatch")
        lm_probs = np.ascontiguousarray(lm.probs, np.float32)
        lm_ent = np.ascontiguousarray(lm.entropy, np.float32)
        lp = lm_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        le = lm_ent.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        lp = ctypes.POINTER(ctypes.c_float)()
        le = ctypes.POINTER(ctypes.c_float)()

    lib.BeamSearchBatch(
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, t,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        beam_width, lp, le, ctx_len,
        float(s_threshold), float(r_threshold),
        out_rev.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out_rev, out_lens, out_scores


def native_seq(rev_row: np.ndarray, n: int, reverse: bool = False,
               bases: str = "ACGT") -> str:
    labs = rev_row[:n]
    if reverse:
        labs = labs[::-1]
    lut = np.frombuffer(bases.encode(), np.uint8)
    return lut[labs].tobytes().decode()
