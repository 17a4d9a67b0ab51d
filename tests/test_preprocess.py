"""Golden tests for preprocessing vs the reference implementation."""

import numpy as np
import pytest

from radian_tpu.ops import preprocess as pp
from tests import reference_oracle as oracle


def _random_signal(rng, n):
    return rng.integers(200, 900, size=n).astype(np.int16)


# ---------------------------------------------------------------------------
# Host numpy path vs reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [5, 100, 1023, 1024, 1025, 12833])
def test_mad_normalise_np_matches_reference(rng, n):
    ref = oracle.preprocess()
    sig = _random_signal(rng, n)
    ours = pp.mad_normalise_np(sig, 4)
    theirs = ref.mad_normalise(sig, 4)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=0)


def test_mad_normalise_np_errors():
    with pytest.raises(ValueError):
        pp.mad_normalise_np(np.array([], dtype=np.int16), 4)
    with pytest.raises(ValueError):
        pp.mad_normalise_np(np.full(100, 7, dtype=np.int16), 4)


@pytest.mark.parametrize(
    "n,window,step",
    [
        (12833, 1024, 128),
        (1024, 1024, 128),
        (1025, 1024, 128),
        (500, 1024, 128),     # shorter than one window
        (4863, 1024, 128),
        (2048, 1024, 1024),   # step == window
        (3000, 512, 64),
        (1152, 1024, 128),    # exact multiple: tail still appended
    ],
)
def test_get_windows_np_matches_reference(rng, n, window, step):
    ref = oracle.preprocess()
    sig = _random_signal(rng, n).astype(np.float64)
    ours, pad_ours = pp.get_windows_np(sig, window, step)
    theirs, pad_theirs = ref.get_windows(sig, window, step)
    assert pad_ours == pad_theirs
    assert pad_ours >= 1
    np.testing.assert_array_equal(ours, theirs)


def test_get_windows_np_validates_step():
    sig = np.zeros(100)
    with pytest.raises(ValueError):
        pp.get_windows_np(sig, 10, 0)
    with pytest.raises(ValueError):
        pp.get_windows_np(sig, 10, 11)


# ---------------------------------------------------------------------------
# Device (jax) path vs host path / reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [100, 1024, 12833, 4863])
def test_mad_normalise_device_matches_reference(rng, n):
    ref = oracle.preprocess()
    sig = _random_signal(rng, n)
    bucket = pp.bucket_length(n)
    padded = np.zeros(bucket, dtype=np.float32)
    padded[:n] = sig
    norm, mad = pp.mad_normalise(padded, np.int32(n), outlier_clip=4.0)
    norm = np.asarray(norm)
    assert float(mad) > 0
    theirs = ref.mad_normalise(sig, 4)
    np.testing.assert_allclose(norm[:n], theirs, rtol=0, atol=2e-5)
    assert np.all(norm[n:] == 0)


def test_mad_normalise_device_flags_zero_mad():
    sig = np.full(4096, 7.0, dtype=np.float32)
    _, mad = pp.mad_normalise(sig, np.int32(4096))
    assert float(mad) == 0.0


@pytest.mark.parametrize("n", [500, 1024, 1152, 4863, 12833])
def test_window_signal_device_matches_host(rng, n):
    sig = rng.normal(size=n).astype(np.float32)
    window, step = 1024, 128
    bucket = pp.bucket_length(n)
    padded = np.zeros(bucket, dtype=np.float32)
    padded[:n] = sig
    max_w = pp.max_windows_for(bucket, window, step)
    win_dev, n_win, pad_end = pp.window_signal(
        padded, np.int32(n), window, step, max_w
    )
    win_host, pad_host = pp.get_windows_np(sig, window, step)
    assert int(n_win) == win_host.shape[0]
    assert int(pad_end) == pad_host
    np.testing.assert_allclose(
        np.asarray(win_dev)[: int(n_win)], win_host, rtol=0, atol=1e-6
    )


def test_preprocess_read_end_to_end(rng):
    ref = oracle.preprocess()
    n = 12833
    sig = _random_signal(rng, n)
    bucket = pp.bucket_length(n)
    padded = np.zeros(bucket, dtype=np.float32)
    padded[:n] = sig
    max_w = pp.max_windows_for(bucket, 1024, 128)
    windows, n_win, pad_end, mad = pp.preprocess_read(
        padded, np.int32(n), 1024, 128, max_w, 4.0
    )
    norm_ref = ref.mad_normalise(sig, 4)
    win_ref, pad_ref = ref.get_windows(norm_ref, 1024, 128)
    assert int(n_win) == win_ref.shape[0]
    assert int(pad_end) == pad_ref
    np.testing.assert_allclose(
        np.asarray(windows)[: int(n_win)], win_ref, rtol=0, atol=2e-5
    )
