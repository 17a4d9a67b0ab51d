"""Native C++ beam-search engine vs the reference oracle."""

import numpy as np
import pytest

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_native import beam_search_native, native_seq
from tests import reference_oracle as oracle
from tests.test_beam_search import _DenseDictView


def _decode(mats, lengths, **kw):
    rev, lens, scores = beam_search_native(mats, lengths, **kw)
    return [
        native_seq(rev[i], int(lens[i]), reverse=True)
        for i in range(mats.shape[0])
    ]


@pytest.mark.parametrize("beam_width", [1, 6])
@pytest.mark.parametrize("t", [1, 8, 120])
def test_native_matches_reference(rng, beam_width, t):
    ref = oracle.decode()
    mats = rng.dirichlet(np.ones(5), size=(4, t)).astype(np.float32)
    ours = _decode(mats, np.full(4, t, np.int32), beam_width=beam_width)
    for i in range(4):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", beam_width, None, None,
            None, None, None,
        )
        assert ours[i] == theirs


def test_native_lm_matches_reference(rng):
    ref = oracle.decode()
    ctx_len = 3
    model = random_kmer_model(rng, context_len=ctx_len, concentration=0.3)
    lm = build_dense_tables(model, ctx_len)
    t = 100
    mats = rng.dirichlet(np.ones(5), size=(3, t)).astype(np.float32)
    ours = _decode(
        mats, np.full(3, t, np.int32), beam_width=6, lm=lm,
        s_threshold=0.3, r_threshold=1.0, ctx_len=ctx_len,
    )
    lm_dict = _DenseDictView(lm)
    for i in range(3):
        theirs = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", 6, lm_dict, 0.3, 1.0,
            ctx_len, {},
        )
        assert ours[i] == theirs


def test_native_variable_lengths(rng):
    ref = oracle.decode()
    mats = rng.dirichlet(np.full(5, 0.3), size=(3, 150)).astype(np.float32)
    lengths = np.asarray([150, 42, 1], np.int32)
    ours = _decode(mats, lengths, beam_width=6)
    for i, ln in enumerate(lengths):
        theirs = ref.beam_search(
            mats[i, :ln].astype(np.float64), "ACGT", 6, None, None, None,
            None, None,
        )
        assert ours[i] == theirs


def test_native_long_matrix_speed(rng):
    """The engine decodes kilostep matrices quickly (smoke perf check)."""
    import time

    mats = rng.dirichlet(np.full(5, 0.3), size=(4, 4000)).astype(np.float32)
    lengths = np.full(4, 4000, np.int32)
    _decode(mats, lengths, beam_width=6)  # warm (lib compile)
    t0 = time.perf_counter()
    _decode(mats, lengths, beam_width=6)
    dt = time.perf_counter() - t0
    assert dt < 10.0  # reference python takes ~40s for this
