"""Beam search decoder vs the reference oracle (exact decoded-string parity)."""

import numpy as np
import pytest

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_search import beam_search_batch, labels_to_seq
from tests import reference_oracle as oracle


def _random_mats(rng, n, t, peaked=False):
    alpha = np.full(5, 0.2 if peaked else 1.0)
    return rng.dirichlet(alpha, size=(n, t)).astype(np.float32)


def _decode_ours(mats, lengths, **kw):
    rev, n_lab, score = beam_search_batch(
        np.asarray(mats, np.float32), np.asarray(lengths, np.int32), **kw
    )
    return [labels_to_seq(np.asarray(r), reverse=True) for r in np.asarray(rev)]


@pytest.mark.parametrize("beam_width", [1, 2, 6])
@pytest.mark.parametrize("t", [1, 2, 8, 50, 200])
def test_no_lm_matches_reference(rng, beam_width, t):
    ref = oracle.decode()
    mats = _random_mats(rng, 4, t)
    ours = _decode_ours(mats, [t] * 4, beam_width=beam_width)
    for i in range(4):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", beam_width, None, None, None,
            None, None,
        )
        assert ours[i] == theirs, f"case {i}: {ours[i]!r} != {theirs!r}"


def test_peaked_matrices_no_lm(rng):
    ref = oracle.decode()
    mats = _random_mats(rng, 6, 120, peaked=True)
    ours = _decode_ours(mats, [120] * 6, beam_width=6)
    for i in range(6):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", 6, None, None, None, None, None
        )
        assert ours[i] == theirs


@pytest.mark.parametrize("s_thr,r_thr", [(0.5, 0.5), (0.1, 1.2), (0.0, 10.0)])
def test_lm_fusion_matches_reference(rng, s_thr, r_thr):
    ref = oracle.decode()
    ctx_len = 3
    model = random_kmer_model(rng, context_len=ctx_len, concentration=0.3)
    lm = build_dense_tables(model, ctx_len)
    # the oracle wants a dict keyed by int tuples covering every context
    oracle_lm = {ctx: dist for ctx, dist in model.items()}

    t = 80
    mats = _random_mats(rng, 4, t)
    ours = _decode_ours(
        mats, [t] * 4, beam_width=6,
        lm_probs=lm.probs, lm_ent=lm.entropy,
        s_threshold=s_thr, r_threshold=r_thr, ctx_len=ctx_len, lm_enabled=True,
    )
    for i in range(4):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", 6, oracle_lm, s_thr, r_thr,
            ctx_len, {},
        )
        assert ours[i] == theirs, f"case {i}: {ours[i]!r} != {theirs!r}"


def test_lm_fusion_context_len_11(rng):
    """Full-size contexts: sparse model, uniform-densified fallbacks."""
    ref = oracle.decode()
    ctx_len = 11
    # sparse: only some contexts known; densified table falls back to uniform
    model = random_kmer_model(rng, context_len=ctx_len, n_contexts=2000,
                              concentration=0.2)
    lm = build_dense_tables(model, ctx_len)
    # oracle dict must cover all contexts it sees: give it the same dense table
    oracle_lm = _DenseDictView(lm)
    t = 120
    mats = _random_mats(rng, 2, t, peaked=True)
    ours = _decode_ours(
        mats, [t] * 2, beam_width=6,
        lm_probs=lm.probs, lm_ent=lm.entropy,
        s_threshold=0.5, r_threshold=0.5, ctx_len=ctx_len, lm_enabled=True,
    )
    for i in range(2):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", 6, oracle_lm, 0.5, 0.5,
            ctx_len, {},
        )
        assert ours[i] == theirs


class _DenseDictView(dict):
    """Expose dense LM tables through the dict interface the oracle uses."""

    def __init__(self, lm):
        super().__init__()
        self._lm = lm

    def __missing__(self, ctx):
        from radian_tpu.lm import pack_context

        return self._lm.probs[pack_context(ctx)].astype(np.float64)

    def __contains__(self, ctx):  # entr_cache bypass safe: always False
        return dict.__contains__(self, ctx)

    def __bool__(self):  # `if lm` must be truthy
        return True


def test_variable_length_batching(rng):
    ref = oracle.decode()
    t_max = 100
    lengths = [100, 37, 64, 1]
    mats = _random_mats(rng, len(lengths), t_max)
    ours = _decode_ours(mats, lengths, beam_width=6)
    for i, ln in enumerate(lengths):
        theirs = ref.beam_search(
            mats[i, :ln].astype(np.float64), "ACGT", 6, None, None, None,
            None, None,
        )
        assert ours[i] == theirs


def test_blank_dominant_gives_empty(rng):
    mats = np.zeros((1, 50, 5), np.float32)
    mats[..., 4] = 0.96
    mats[..., :4] = 0.01
    ours = _decode_ours(mats, [50], beam_width=6)
    assert ours[0] == ""


def test_fasta_orientation(rng):
    """labels_to_seq default emits the reversed (5'→3') string."""
    mats = _random_mats(rng, 1, 60)
    rev, _, _ = beam_search_batch(mats, np.int32([60]), beam_width=6)
    fwd = labels_to_seq(np.asarray(rev[0]), reverse=True)
    rev_seq = labels_to_seq(np.asarray(rev[0]))
    assert rev_seq == fwd[::-1]


def test_packed_lm_matches_dense(rng):
    """KmerLM.compressed(): two-level packed tables give bit-identical
    decodes (labels, lengths, scores) to the dense tables, and the
    provenance-free dedup fallback builds the same packing."""
    import jax.numpy as jnp

    from radian_tpu.lm.kmer import KmerLM

    ctx_len = 6
    lm = build_dense_tables(
        random_kmer_model(rng, context_len=ctx_len, n_contexts=500,
                          concentration=0.2),
        ctx_len,
    )
    l1, vals = lm.compressed()
    assert vals.shape[0] == 501  # uniform row + 500 real rows
    l1b, valsb = KmerLM(ctx_len, lm.probs, lm.entropy, None).compressed()
    np.testing.assert_array_equal(l1, l1b)
    np.testing.assert_array_equal(vals, valsb)

    t = 120
    mats = _random_mats(rng, 6, t)
    lens = np.int32([t, t // 2, t, 17, t, t - 1])
    dense = beam_search_batch(
        mats, lens, beam_width=6, lm_probs=jnp.asarray(lm.probs),
        lm_ent=jnp.asarray(lm.entropy), ctx_len=ctx_len, lm_enabled=True,
    )
    packed = beam_search_batch(
        mats, lens, beam_width=6, lm_l1=jnp.asarray(l1),
        lm_vals=jnp.asarray(vals), ctx_len=ctx_len, lm_enabled=True,
    )
    for a, b in zip(dense, packed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_label_nibble_pack_roundtrip(rng):
    from radian_tpu.ops.beam_search import (
        pack_labels,
        rows_to_seqs,
        unpack_labels,
    )

    rev = rng.integers(-1, 4, size=(3, 7, 64)).astype(np.int8)
    packed = np.asarray(pack_labels(rev))
    assert packed.shape == (3, 7, 32) and packed.dtype == np.uint8
    np.testing.assert_array_equal(unpack_labels(packed), rev)

    # rows_to_seqs == per-row labels_to_seq(reverse=True)
    rows = rev[0, :, :]
    want = [labels_to_seq(r, reverse=True) for r in rows]
    assert rows_to_seqs(rows) == want
