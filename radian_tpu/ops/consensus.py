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

import difflib

import numpy as np

BASES = "ACGT"
_IDX = {b: i for i, b in enumerate(BASES)}


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
        sm = difflib.SequenceMatcher(None, fragments[i - 1], frag)
        block = max(sm.get_matching_blocks(), key=lambda b: b.size)
        disp = block.a - block.b
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


def assemble_fragments(fragments: list[str]) -> str:
    return consensus_sequence(simple_assembly(fragments))
