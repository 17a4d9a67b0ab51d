"""Evaluation tooling: alignment identity + SAM accuracy."""

import numpy as np
import pytest

from radian_tpu.eval.accuracy import sam_accuracy
from radian_tpu.eval.align import (
    alignment_stats,
    evaluate_fasta,
    global_align,
    read_identity,
)


def test_align_identical():
    ra, qa = global_align("ACGTACGT", "ACGTACGT")
    assert ra == qa == "ACGTACGT"
    st = read_identity("ACGTACGT", "ACGTACGT")
    assert st["accuracy"] == 100.0
    assert st["n_match"] == 8


def test_align_substitution():
    st = read_identity("ACGTACGT", "ACGTTCGT")
    assert st["n_sub"] == 1
    assert st["n_match"] == 7


def test_align_insertion_deletion():
    st = read_identity("ACGTACGT", "ACGACGT")  # one deletion in query
    assert st["n_del"] == 1
    st = read_identity("ACGACGT", "ACGTACGT")  # one insertion in query
    assert st["n_ins"] == 1


def test_u_to_t_normalisation():
    st = read_identity("ACGT", "ACGU")
    assert st["accuracy"] == 100.0


def test_soft_clip_leading_garbage():
    """Leading query-only bases (ref gaps) are clipped, not counted."""
    ra = "---ACGTACGT"
    qa = "TTTACGTACGT"
    n_mat, n_sub, n_ins, n_del = alignment_stats(ra, qa)
    assert n_ins == 0
    assert n_mat == 8


def test_alignment_matches_biopython_scoring(rng):
    """Score consistency: our aligner's implied score should equal a
    brute-force optimum on small cases (affine gap: open -4 extend -2)."""
    def score(ra, qa):
        s = 0.0
        in_gap_r = in_gap_q = False
        for r, q in zip(ra, qa):
            if r == "-":
                s += -2.0 if in_gap_r else -4.0
                in_gap_r, in_gap_q = True, False
            elif q == "-":
                s += -2.0 if in_gap_q else -4.0
                in_gap_q, in_gap_r = True, False
            else:
                s += 2.0 if r == q else -4.0
                in_gap_r = in_gap_q = False
        return s

    for _ in range(10):
        n1, n2 = rng.integers(3, 10, 2)
        ref = "".join(rng.choice(list("ACGT"), n1))
        q = "".join(rng.choice(list("ACGT"), n2))
        ra, qa = global_align(ref, q)
        got = score(ra, qa)
        best = _brute_force_best(ref, q)
        assert got == pytest.approx(best), (ref, q, ra, qa)


def test_aligner_matches_scalar_dp_at_scale(rng):
    """The vectorised max-plus-scan aligner must reproduce the plain
    per-cell Gotoh DP score on realistic-size pairs (and finish kb-scale
    pairs quickly — the round-2 per-cell Python loop crawled there)."""

    def scalar_gotoh_score(ref, q, ma=2.0, mi=-4.0, go=-4.0, ge=-2.0):
        n, m = len(ref), len(q)
        NEG = -1e9
        M = np.full((n + 1, m + 1), NEG)
        X = np.full((n + 1, m + 1), NEG)
        Y = np.full((n + 1, m + 1), NEG)
        M[0, 0] = 0.0
        for i in range(1, n + 1):
            X[i, 0] = go + (i - 1) * ge
        for j in range(1, m + 1):
            Y[0, j] = go + (j - 1) * ge
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                s = ma if ref[i - 1] == q[j - 1] else mi
                M[i, j] = max(M[i-1][j-1], X[i-1][j-1], Y[i-1][j-1]) + s
                X[i, j] = max(M[i-1][j] + go, X[i-1][j] + ge, Y[i-1][j] + go)
                Y[i, j] = max(M[i][j-1] + go, X[i][j-1] + go, Y[i][j-1] + ge)
        return max(M[n, m], X[n, m], Y[n, m])

    def aln_score(ra, qa):
        s, gr, gq = 0.0, False, False
        for r, q in zip(ra, qa):
            if r == "-":
                s += -2.0 if gr else -4.0
                gr, gq = True, False
            elif q == "-":
                s += -2.0 if gq else -4.0
                gq, gr = True, False
            else:
                s += 2.0 if r == q else -4.0
                gr = gq = False
        return s

    for _ in range(3):
        n1, n2 = rng.integers(150, 250, 2)
        ref = "".join(rng.choice(list("ACGT"), n1))
        q = "".join(rng.choice(list("ACGT"), n2))
        ra, qa = global_align(ref, q)
        assert aln_score(ra, qa) == pytest.approx(scalar_gotoh_score(ref, q))

    # kb-scale pair: mutate a 1.5 kb ref into a query; identity must be
    # high and the run must not crawl (per-cell Python would take >60 s)
    import time

    base = rng.choice(list("ACGT"), 1500)
    qarr = base.copy()
    flip = rng.random(1500) < 0.05
    qarr[flip] = rng.choice(list("ACGT"), int(flip.sum()))
    t0 = time.perf_counter()
    st = read_identity("".join(base), "".join(qarr))
    assert time.perf_counter() - t0 < 5.0
    assert st["accuracy"] > 90.0


def _brute_force_best(ref, q):
    """Exponential-time exact affine-gap global alignment score."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def go(i, j, state):
        if i == len(ref) and j == len(q):
            return 0.0
        best = -1e18
        if i < len(ref) and j < len(q):
            s = 2.0 if ref[i] == q[j] else -4.0
            best = max(best, s + go(i + 1, j + 1, 0))
        if i < len(ref):
            cost = -2.0 if state == 1 else -4.0
            best = max(best, cost + go(i + 1, j, 1))
        if j < len(q):
            cost = -2.0 if state == 2 else -4.0
            best = max(best, cost + go(i, j + 1, 2))
        return best

    return go(0, 0, 0)


def test_evaluate_fasta(tmp_path):
    (tmp_path / "out.fasta").write_text(">r1\nACGTACGTAA\n>r2\nTTTTACGT\n")
    (tmp_path / "refs.tsv").write_text(
        "read\ttxt\tseq\nr1\tt1\tACGTACGTAA\nr2\tt2\tTTTTACGT\n"
    )
    summary = evaluate_fasta(tmp_path / "out.fasta", tmp_path / "refs.tsv",
                             tmp_path / "out.tsv")
    assert summary["n_reads"] == 2
    assert summary["accuracy"]["median"] == 100.0
    assert (tmp_path / "out.tsv").read_text().count("\n") == 3


SAM_TEXT = """\
@SQ\tSN:ENST1|g|h|i|j|k|l|protein_coding|x\tLN:1000
r1\t0\tENST1|g|h|i|j|k|l|protein_coding|x\t1\t60\t8M\t*\t0\t0\tACGTACGT\t*\tNM:i:1
r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\t*
r3\t16\tENST1|g|h|i|j|k|l|protein_coding|x\t1\t60\t4M\t*\t0\t0\tACGT\t*\tNM:i:0
r4\t0\tENST2|g|h|i|j|k|l|lncRNA|x\t1\t60\t4M\t*\t0\t0\tACGT\t*\tNM:i:0
r5\t0\tENST1|g|h|i|j|k|l|protein_coding|x\t1\t60\t4M1I2M1D2M\t*\t0\t0\tACGTAACGT\t*\tNM:i:3
"""


def test_sam_accuracy(tmp_path):
    p = tmp_path / "aln.sam"
    p.write_text(SAM_TEXT)
    summary = sam_accuracy(p, tmp_path / "aln.tsv")
    # r1: 8M NM=1 -> 7 match 1 sub; r5: 8M 1I 1D NM=3 -> sub=1, match=7
    assert summary["n_reads"] == 2
    assert summary["unmapped"] == 1
    assert summary["reverse"] == 1
    # identity = match / (match + NM):  r1: 7/(7+1); r5: 7/(7+3)
    r1_acc = 7 / 8 * 100
    r5_acc = 7 / 10 * 100
    assert summary["accuracy"]["mean"] == pytest.approx((r1_acc + r5_acc) / 2)
    tsv = (tmp_path / "aln.tsv").read_text()
    assert "r1\tENST1\t7\t0\t0\t1" in tsv
    assert "r5\tENST1\t7\t1\t1\t1" in tsv


def test_evaluate_fasta_baseline_optin(tmp_path):
    """random_baseline doubles eval cost, so it is opt-in (ADVICE r4);
    an empty match set returns {} without touching np.median."""
    (tmp_path / "out.fasta").write_text(">r1\nACGTACGTAA\n")
    (tmp_path / "refs.tsv").write_text("read\ttxt\tseq\nr1\tt1\tACGTACGTAA\n")
    plain = evaluate_fasta(tmp_path / "out.fasta", tmp_path / "refs.tsv")
    assert "random_baseline" not in plain
    with_bl = evaluate_fasta(tmp_path / "out.fasta", tmp_path / "refs.tsv",
                             with_baseline=True)
    assert 0.0 <= with_bl["random_baseline"]["median"] <= 100.0
    (tmp_path / "refs2.tsv").write_text("read\ttxt\tseq\nzz\tt1\tACGT\n")
    assert evaluate_fasta(tmp_path / "out.fasta", tmp_path / "refs2.tsv") == {}
