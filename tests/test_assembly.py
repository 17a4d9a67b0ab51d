"""Assembly (global-mode stitch + chunk-mode consensus) vs the reference."""

import numpy as np
import pytest

from radian_tpu.ops.assembly import assemble_matrices, assemble_matrices_np
from radian_tpu.ops.consensus import assemble_fragments, simple_assembly
from tests import reference_oracle as oracle


def _window_mats(rng, n_windows, window=1024, c=5, tail_trim=0):
    mats = [
        rng.dirichlet(np.ones(c), size=window).astype(np.float32)
        for _ in range(n_windows)
    ]
    if tail_trim:
        mats[-1] = mats[-1][:-tail_trim]
    return mats


@pytest.mark.parametrize("n_windows,tail_trim", [(1, 7), (2, 100), (5, 3), (9, 127)])
def test_assemble_np_matches_reference(rng, n_windows, tail_trim):
    ref = oracle.matrix_assembly()
    mats = _window_mats(rng, n_windows, tail_trim=tail_trim)
    step = 128
    theirs = ref.assemble_matrices(mats, step)
    ours = assemble_matrices_np(mats, step, mode="first")
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-7)


@pytest.mark.parametrize("n_windows,pad_end", [(1, 7), (2, 100), (5, 3), (9, 127)])
def test_assemble_device_matches_reference(rng, n_windows, pad_end):
    ref = oracle.matrix_assembly()
    window, step = 1024, 128
    mats = _window_mats(rng, n_windows, window)
    trimmed = [m for m in mats[:-1]] + [mats[-1][: window - pad_end]]
    theirs = ref.assemble_matrices(trimmed, step)

    max_w = n_windows + 2  # device buffer can exceed the true count
    stack = np.zeros((max_w, window, 5), np.float32)
    stack[:n_windows] = np.stack(mats)
    out_len = (max_w - 1) * step + window
    assembled, t_read = assemble_matrices(
        stack, np.int32(n_windows), np.int32(pad_end),
        step=step, window=window, out_len=out_len,
    )
    assembled = np.asarray(assembled)
    assert int(t_read) == theirs.shape[0]
    np.testing.assert_allclose(assembled[: int(t_read)], theirs, atol=1e-6)
    assert np.all(assembled[int(t_read):] == 0)


def test_assemble_device_mean_mode(rng):
    """True-mean mode: rows are L1-normalised means of covering windows."""
    window, step, n_windows, pad_end = 1024, 128, 4, 64
    mats = _window_mats(rng, n_windows, window)
    stack = np.stack(mats)
    out_len = (n_windows - 1) * step + window
    assembled, t_read = assemble_matrices(
        stack, np.int32(n_windows), np.int32(pad_end),
        step=step, window=window, out_len=out_len, mode="mean",
    )
    assembled = np.asarray(assembled)
    t = 2 * step + 5  # covered by windows 0,1,2
    expect = (mats[0][t] + mats[1][t - step] + mats[2][t - 2 * step]) / 3
    expect = expect / expect.sum()
    np.testing.assert_allclose(assembled[t], expect, atol=1e-6)


def _random_fragments(rng, n, base_len=30, overlap=20):
    full = "".join(rng.choice(list("ACGT"), size=base_len * n))
    frags = []
    stride = base_len - overlap if base_len > overlap else 5
    for i in range(n):
        start = i * stride
        frags.append(full[start : start + base_len])
    return [f for f in frags if f]


@pytest.mark.parametrize("n", [1, 2, 5, 12])
def test_simple_assembly_matches_reference(rng, n):
    ref = oracle.sequence_assembly()
    frags = _random_fragments(rng, n)
    theirs = ref.simple_assembly(frags)
    ours = simple_assembly(frags)
    np.testing.assert_array_equal(ours, theirs)
    ours_seq = assemble_fragments(frags)
    theirs_seq = ref.index2base(np.argmax(theirs, axis=0))
    assert ours_seq == theirs_seq


def test_simple_assembly_noisy_fragments(rng):
    ref = oracle.sequence_assembly()
    frags = _random_fragments(rng, 8, base_len=40, overlap=25)
    noisy = []
    for f in frags:
        f = list(f)
        j = rng.integers(0, len(f))
        f[j] = rng.choice(list("ACGT"))
        noisy.append("".join(f))
    np.testing.assert_array_equal(
        simple_assembly(noisy), ref.simple_assembly(noisy)
    )
