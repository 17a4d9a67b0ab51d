"""Chunk-mode sequence consensus: stitch per-window decoded fragments.

Reference behavior (reference radian/sequence_assembly.py:19-48, vendored
there from Chiron/causalcall): align each fragment against its
predecessor by the longest matching block (difflib), accumulate base
votes in a 4×N count matrix at the running displacement, then call the
per-position argmax (ties → A<C<G<T order, reference
sequence_assembly.py:90-97 via np.argmax).

difflib is python stdlib — using it here reproduces the reference's exact
alignment tie-breaking without copying any reference code.  The heavy
compute in chunk mode (per-window beam search) runs batched on TPU; this
stitcher is O(total fragment length) host work.
"""

from __future__ import annotations

import ctypes
import difflib
import os

import numpy as np

BASES = "ACGT"
_IDX = {b: i for i, b in enumerate(BASES)}

_seqmatch_lib: object = None


def _native_matcher():
    """ctypes handle to the C++ difflib longest-block matcher, or None.

    difflib dominates chunk-mode host time (~110 ms/read on dense
    fragments); the native matcher (native/seqmatch.cc) reproduces its
    result exactly (fuzz-tested) at ~50× the speed.  Set
    RADIAN_NATIVE_SEQMATCH=0 to force the stdlib path.
    """
    global _seqmatch_lib
    if _seqmatch_lib is None:
        if os.environ.get("RADIAN_NATIVE_SEQMATCH", "1") == "0":
            _seqmatch_lib = False
        else:
            try:
                from radian_tpu.native import build_library

                lib = ctypes.CDLL(str(build_library("seqmatch")))
                lib.LongestBlock.restype = None
                lib.LongestBlock.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_long),
                ]
                lib.AssembleFragments.restype = ctypes.c_long
                lib.AssembleFragments.argtypes = [
                    ctypes.c_char_p,
                    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                    ctypes.c_long,
                    ctypes.c_char_p,
                ]
                lib.AssembleRead.restype = ctypes.c_long
                lib.AssembleRead.argtypes = [
                    np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                    ctypes.c_long,
                    ctypes.c_long,
                    ctypes.c_char_p,
                ]
                lib.AssembleRead2.restype = ctypes.c_long
                lib.AssembleRead2.argtypes = [
                    np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    ctypes.c_long,
                    ctypes.c_long,
                    ctypes.c_char_p,
                ]
                _seqmatch_lib = lib
            except Exception:
                _seqmatch_lib = False
    return _seqmatch_lib or None


_B2I = np.full(256, 255, np.uint8)
for _i, _b in enumerate(BASES.encode()):
    _B2I[_b] = _i
    _B2I[_b + 32] = _i  # lowercase, like _IDX via .upper()
_I2B = np.frombuffer(BASES.encode(), np.uint8)


def _assemble_native(fragments: list[str]) -> str | None:
    """One-call C++ consensus (matcher + votes + argmax), or None.

    The pure-python stitch costs ~8 ms/read at ~110 fragments (a
    per-character vote loop plus a ctypes round trip per pair); the
    native whole-read call is ~sub-ms.  Exactness vs the python path is
    fuzz-checked in tests/test_native_seqmatch.py.  Set
    RADIAN_NATIVE_CONSENSUS=0 to force the python path.
    """
    lib = _native_matcher()
    if lib is None or os.environ.get("RADIAN_NATIVE_CONSENSUS", "1") == "0":
        return None
    data = _B2I[np.frombuffer("".join(fragments).encode(), np.uint8)]
    if data.size and data.max() > 3:
        return None  # non-ACGT character: fall back to python (KeyError)
    offsets = np.zeros(len(fragments) + 1, np.int64)
    np.cumsum([len(f) for f in fragments], out=offsets[1:])
    max_len = max((len(f) for f in fragments), default=0)
    out = ctypes.create_string_buffer(int(offsets[-1]) + max_len + 1)
    n = lib.AssembleFragments(
        data.tobytes(), offsets, len(fragments), out
    )
    return _I2B[np.frombuffer(out.raw[:n], np.uint8)].tobytes().decode()


def longest_block(a: str, b: str):
    """``(a_start, b_start, size)`` of difflib's longest matching block."""
    lib = _native_matcher()
    if lib is not None:
        out = (ctypes.c_long * 3)()
        ab, bb = a.encode(), b.encode()
        lib.LongestBlock(ab, len(ab), bb, len(bb), out)
        return out[0], out[1], out[2]
    sm = difflib.SequenceMatcher(None, a, b)
    blk = max(sm.get_matching_blocks(), key=lambda m: m.size)
    return blk.a, blk.b, blk.size


def simple_assembly(fragments: list[str]) -> np.ndarray:
    """Vote-matrix consensus of decoded fragments; returns ``[4, L]`` counts."""
    if not fragments:
        return np.zeros((4, 0))
    cap = 1000
    counts = np.zeros((4, cap))
    pos = 0
    length = 0
    for i, frag in enumerate(fragments):
        if i == 0:
            # quirk preserved: the reference never counts the first fragment
            # toward ``length`` (reference sequence_assembly.py:25-27), so a
            # single-fragment read assembles to an empty consensus.
            _vote(counts, 0, frag)
            continue
        blk_a, blk_b, _ = longest_block(fragments[i - 1], frag)
        disp = blk_a - blk_b
        while disp + pos + len(frag) > cap:
            counts = np.pad(counts, ((0, 0), (0, 1000)))
            cap += 1000
        _vote(counts, pos + disp, frag)
        pos += disp
        length = max(length, pos + len(frag))
    return counts[:, :length]


def _vote(counts: np.ndarray, start: int, fragment: str) -> None:
    if start < 0:
        fragment = fragment[-start:]
        start = 0
    for i, base in enumerate(fragment):
        counts[_IDX[base.upper()], start + i] += 1


def consensus_sequence(counts: np.ndarray) -> str:
    """argmax over the vote matrix → base string (reference index2base)."""
    return "".join(BASES[i] for i in np.argmax(counts, axis=0))


def assemble_read_packed(packed_rows: np.ndarray) -> str | None:
    """Consensus straight from compacted nibble-packed label rows.

    ``packed_rows``: ``[n_wins, bytes_per_win]`` uint8 — the fused chunk
    program's per-window output (pack_labels of front-compacted
    emissions).  Renders fragments AND stitches in one C++ call
    (native/seqmatch.cc AssembleRead); returns None when the native
    library is unavailable (caller falls back to
    rows_to_seqs + assemble_fragments, which is exactness-equivalent —
    fuzz-checked in tests/test_native_seqmatch.py).
    """
    lib = _native_matcher()
    if lib is None or os.environ.get("RADIAN_NATIVE_CONSENSUS", "1") == "0":
        return None
    rows = np.ascontiguousarray(packed_rows, np.uint8)
    n_wins, bpw = rows.shape
    cap = n_wins * bpw * 2 + bpw * 2 + 1
    out = ctypes.create_string_buffer(cap)
    n = lib.AssembleRead(rows, n_wins, bpw, out)
    return _I2B[np.frombuffer(out.raw[:n], np.uint8)].tobytes().decode()


def assemble_read_packed2(packed_rows: np.ndarray,
                          n_lab: np.ndarray) -> str | None:
    """Consensus from 2-bit-packed label rows + per-window counts.

    ``packed_rows``: ``[n_wins, bytes_per_win]`` uint8 (four labels per
    byte, ``pack_labels2``); ``n_lab``: ``[n_wins]`` emission counts.
    One C++ call per read; None when the native library is unavailable.
    """
    lib = _native_matcher()
    if lib is None or os.environ.get("RADIAN_NATIVE_CONSENSUS", "1") == "0":
        return None
    rows = np.ascontiguousarray(packed_rows, np.uint8)
    counts = np.ascontiguousarray(n_lab, np.int32)
    n_wins, bpw = rows.shape
    cap = int(counts.clip(0, bpw * 4).sum()) + bpw * 4 + 1
    out = ctypes.create_string_buffer(cap)
    n = lib.AssembleRead2(rows, counts, n_wins, bpw, out)
    return _I2B[np.frombuffer(out.raw[:n], np.uint8)].tobytes().decode()


def assemble_fragments(fragments: list[str]) -> str:
    if not fragments:
        return ""
    native = _assemble_native(fragments)
    if native is not None:
        return native
    return consensus_sequence(simple_assembly(fragments))
