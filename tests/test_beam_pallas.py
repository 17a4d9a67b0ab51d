"""Pallas beam-search kernel vs the XLA scan decoder (interpret mode).

The scan decoder is itself string-parity-tested against the reference
(tests/test_beam_search.py); the kernel must reproduce it exactly.
"""

import numpy as np
import pytest

from radian_tpu.ops.beam_pallas import beam_search_pallas
from radian_tpu.ops.beam_search import beam_search_batch, labels_to_seq


def _decode_strings(rev, n):
    return [labels_to_seq(np.asarray(rev[i]), reverse=True) for i in range(n)]


@pytest.mark.parametrize("peaked", [False, True])
@pytest.mark.slow
def test_kernel_matches_scan_decoder(rng, peaked):
    n, t = 4, 256
    alpha = np.full(5, 0.2 if peaked else 1.0)
    mats = rng.dirichlet(alpha, size=(n, t)).astype(np.float32)
    lengths = np.asarray([t, t // 2, 37, 1], np.int32)

    rev_k, nlab_k, score_k = beam_search_pallas(
        mats, lengths, beam_width=6, interpret=True, unroll=1
    )
    rev_s, nlab_s, score_s = beam_search_batch(
        mats, lengths, beam_width=6, lm_enabled=False
    )
    got = _decode_strings(np.asarray(rev_k), n)
    want = _decode_strings(np.asarray(rev_s), n)
    assert got == want
    np.testing.assert_array_equal(np.asarray(nlab_k), np.asarray(nlab_s))
    np.testing.assert_allclose(
        np.asarray(score_k), np.asarray(score_s), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_kernel_matches_reference_oracle(rng):
    from tests import reference_oracle as oracle

    ref = oracle.decode()
    n, t = 2, 256
    mats = rng.dirichlet(np.ones(5), size=(n, t)).astype(np.float32)
    lengths = np.full(n, t, np.int32)
    rev_k, _, _ = beam_search_pallas(mats, lengths, beam_width=6,
                                     interpret=True, unroll=1)
    got = _decode_strings(np.asarray(rev_k), n)
    for i in range(n):
        want = ref.beam_search(
            mats[i].astype(np.float64), "ACGT", 6, None, None, None, None,
            None,
        )
        assert got[i] == want


@pytest.mark.slow
def test_kernel_multichunk(rng):
    """T spanning multiple DMA chunks (CHUNK=256)."""
    n, t = 2, 600  # pads to 768 = 3 chunks
    mats = rng.dirichlet(np.full(5, 0.3), size=(n, t)).astype(np.float32)
    lengths = np.asarray([600, 300], np.int32)
    rev_k, nlab_k, _ = beam_search_pallas(mats, lengths, beam_width=6,
                                          interpret=True, unroll=1)
    rev_s, nlab_s, _ = beam_search_batch(mats, lengths, beam_width=6)
    assert _decode_strings(np.asarray(rev_k), n) == _decode_strings(
        np.asarray(rev_s), n
    )


@pytest.mark.slow
def test_kernel_beam_width_8(rng):
    """Full sublane occupancy (beam_width == WSUB == 8): the kernel's
    selection/merge logic at its boundary matches the scan decoder."""
    n, t = 4, 192
    mats = rng.dirichlet(np.full(5, 0.6), size=(n, t)).astype(np.float32)
    lengths = np.asarray([t, t - 1, 64, 2], np.int32)
    rev_k, nlab_k, _ = beam_search_pallas(
        mats, lengths, beam_width=8, interpret=True, unroll=1
    )
    rev_s, nlab_s, _ = beam_search_batch(
        mats, lengths, beam_width=8, lm_enabled=False
    )
    assert _decode_strings(np.asarray(rev_k), n) == \
        _decode_strings(np.asarray(rev_s), n)
    np.testing.assert_array_equal(np.asarray(nlab_k), np.asarray(nlab_s))


def test_pallas_max_beam_matches_wsub():
    """pipeline.PALLAS_MAX_BEAM is a literal copy of beam_pallas.WSUB
    (kept separate so CPU hosts never import the pallas module) — keep
    them in sync."""
    from radian_tpu.ops import beam_pallas
    from radian_tpu.pipeline import PALLAS_MAX_BEAM

    assert PALLAS_MAX_BEAM == beam_pallas.WSUB
