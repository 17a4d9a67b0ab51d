"""Native seqmatch (C++ difflib longest-block) exactness fuzz tests."""

import difflib

import numpy as np
import pytest

from radian_tpu.ops.consensus import _native_matcher, longest_block


def _difflib_block(a: str, b: str):
    sm = difflib.SequenceMatcher(None, a, b)
    blk = max(sm.get_matching_blocks(), key=lambda m: m.size)
    return blk.a, blk.b, blk.size


@pytest.fixture(scope="module")
def native():
    lib = _native_matcher()
    if lib is None:
        pytest.skip("native seqmatch unavailable (g++ build failed)")
    return lib


def test_fuzz_vs_difflib(native, rng):
    """Random base strings, lengths crossing difflib's autojunk
    threshold (len(b) >= 200 empties b2j for a 4-letter alphabet —
    degenerate behavior that must match too)."""
    for trial in range(300):
        la = int(rng.integers(0, 260))
        lb = int(rng.integers(0, 260))
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, la))
        b = "".join("ACGT"[i] for i in rng.integers(0, 4, lb))
        assert longest_block(a, b) == _difflib_block(a, b), (trial, a, b)


def test_fuzz_overlapping_fragments(native, rng):
    """Adjacent-window-like pairs: b = shifted copy of a with noise —
    the chunk-consensus workload shape."""
    for trial in range(200):
        n = int(rng.integers(20, 240))
        seq = rng.integers(0, 4, n + 60)
        shift = int(rng.integers(0, 40))
        a = "".join("ACGT"[i] for i in seq[:n])
        bl = list(seq[shift:shift + n])
        for _ in range(int(rng.integers(0, 6))):  # point mutations
            bl[int(rng.integers(0, len(bl)))] = int(rng.integers(0, 4))
        b = "".join("ACGT"[i] for i in bl)
        assert longest_block(a, b) == _difflib_block(a, b), (trial, a, b)


def test_consensus_uses_native_and_matches_stdlib(native, rng, monkeypatch):
    """assemble_fragments output is identical with and without the
    native matcher."""
    import radian_tpu.ops.consensus as cons

    frags = []
    seq = rng.integers(0, 4, 400)
    for s in range(0, 300, 25):
        frag = seq[s:s + 120]
        frags.append("".join("ACGT"[i] for i in frag))
    with_native = cons.assemble_fragments(frags)
    monkeypatch.setattr(cons, "_seqmatch_lib", False)
    without = cons.assemble_fragments(frags)
    monkeypatch.setattr(cons, "_seqmatch_lib", None)
    assert with_native == without


def test_fuzz_skewed_composition(native, rng):
    """Skewed base composition past the autojunk threshold (len(b) >=
    200): a rare base occurring <= len//100+1 times stays non-popular,
    so b2j is non-empty while the other bases ARE popular.  stdlib's
    bjunk is still EMPTY under isjunk=None, so the extension passes run
    over all equal elements — the regime the advisor found diverging
    when popular elements were wrongly treated as junk."""
    for trial in range(300):
        lb = int(rng.integers(200, 400))
        la = int(rng.integers(150, 400))
        rare = int(rng.integers(0, 4))
        n_rare = int(rng.integers(1, lb // 100 + 2))  # stays non-popular
        common = [i for i in range(4) if i != rare]
        bl = [common[int(i)] for i in rng.integers(0, 3, lb)]
        for pos in rng.choice(lb, size=min(n_rare, lb), replace=False):
            bl[int(pos)] = rare
        al = [common[int(i)] for i in rng.integers(0, 3, la)]
        # give a a share of rare bases too so blocks can span them
        for pos in rng.choice(la, size=min(n_rare, la), replace=False):
            al[int(pos)] = rare
        a = "".join("ACGT"[i] for i in al)
        b = "".join("ACGT"[i] for i in bl)
        assert longest_block(a, b) == _difflib_block(a, b), (trial, a, b)


def test_fuzz_skewed_overlap_fragments(native, rng):
    """Overlapping-fragment pairs with skewed composition (chunk
    workload shape, autojunk regime with a non-popular rare base)."""
    for trial in range(150):
        n = int(rng.integers(200, 350))
        rare = int(rng.integers(0, 4))
        common = [i for i in range(4) if i != rare]
        seq = np.array([common[int(i)] for i in rng.integers(0, 3, n + 80)])
        for pos in rng.choice(len(seq), size=3, replace=False):
            seq[int(pos)] = rare
        shift = int(rng.integers(0, 50))
        a = "".join("ACGT"[i] for i in seq[:n])
        bl = list(seq[shift:shift + n])
        for _ in range(int(rng.integers(0, 6))):
            bl[int(rng.integers(0, len(bl)))] = int(rng.integers(0, 4))
        b = "".join("ACGT"[i] for i in bl)
        assert longest_block(a, b) == _difflib_block(a, b), (trial, a, b)


def _python_consensus(frags):
    from radian_tpu.ops.consensus import consensus_sequence, simple_assembly
    return consensus_sequence(simple_assembly(frags))


def test_native_consensus_fuzz(native, rng):
    """Whole-read native consensus (AssembleFragments) == python stitch
    on overlapping-fragment workloads, incl. autojunk lengths."""
    from radian_tpu.ops.consensus import _assemble_native

    for trial in range(120):
        n_frag = int(rng.integers(1, 14))
        seq = rng.integers(0, 4, 600)
        frags = []
        start = 0
        for _ in range(n_frag):
            ln = int(rng.integers(0, 300))
            frag = list(seq[start:start + ln])
            for _ in range(int(rng.integers(0, 5))):
                if frag:
                    frag[int(rng.integers(0, len(frag)))] = int(
                        rng.integers(0, 4))
            frags.append("".join("ACGT"[i] for i in frag))
            start += int(rng.integers(0, 60))
        got = _assemble_native(frags)
        assert got is not None
        assert got == _python_consensus(frags), (trial, frags)


def test_native_consensus_edge_cases(native):
    from radian_tpu.ops.consensus import _assemble_native, assemble_fragments

    assert assemble_fragments([]) == ""
    # single fragment: reference quirk — consensus is empty
    assert _assemble_native(["ACGT"]) == _python_consensus(["ACGT"]) == ""
    # empty fragments advance pos without voting (trailing-'A' regime)
    for frags in (["", ""], ["ACGTACGT", ""], ["", "ACGT"],
                  ["ACGTAC", "", "GTACGT"]):
        assert _assemble_native(frags) == _python_consensus(frags), frags


def test_assemble_read_packed_fuzz(native, rng):
    """AssembleRead (nibble-packed rows -> consensus in one C++ call) ==
    rows_to_seqs + python consensus on compacted label rows."""
    from radian_tpu.ops.beam_search import rows_to_seqs
    from radian_tpu.ops.consensus import assemble_read_packed

    for trial in range(60):
        n_wins = int(rng.integers(1, 12))
        max_lab = 2 * int(rng.integers(2, 40))
        rows = np.full((n_wins, max_lab), -1, np.int8)
        for w in range(n_wins):
            m = int(rng.integers(0, max_lab + 1))
            rows[w, :m] = rng.integers(0, 4, m)
        packed = (rows[:, 0::2] + 1).astype(np.uint8) | \
            ((rows[:, 1::2] + 1).astype(np.uint8) << 4)
        got = assemble_read_packed(packed)
        assert got is not None
        frags = rows_to_seqs(rows)
        assert got == _python_consensus(frags), (trial, rows)


@pytest.mark.slow
def test_assemble_read_packed2_fuzz(native, rng):
    """2-bit-packed AssembleRead2 == python consensus; also round-trips
    pack_labels2/unpack_labels2."""
    import jax.numpy as jnp

    from radian_tpu.ops.beam_search import (
        pack_labels2,
        rows_to_seqs,
        unpack_labels2,
    )
    from radian_tpu.ops.consensus import assemble_read_packed2

    for trial in range(60):
        n_wins = int(rng.integers(1, 12))
        max_lab = 4 * int(rng.integers(1, 24))
        rows = np.full((n_wins, max_lab), -1, np.int8)
        counts = np.zeros(n_wins, np.int32)
        for w in range(n_wins):
            m = int(rng.integers(0, max_lab + 1))
            rows[w, :m] = rng.integers(0, 4, m)
            counts[w] = m
        packed = np.asarray(pack_labels2(jnp.asarray(rows)))
        back = unpack_labels2(packed, counts)
        assert np.array_equal(back, rows), trial
        got = assemble_read_packed2(packed, counts)
        assert got is not None
        assert got == _python_consensus(rows_to_seqs(rows)), (trial, rows)
