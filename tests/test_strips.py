"""Strip fast-path equivalence: the strip forward must reproduce the
full-window forward + "first" assembly exactly (same conv values at kept
positions by the receptive-field argument in ops/preprocess.py:
strip_signal), hence identical decoded strings.

Reference semantics under test: radian/matrix_assembly.py:6-53 row
selection + L1 renormalise, radian/preprocess.py:4-22 window accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions


@pytest.fixture(scope="module")
def params():
    model = build_model()
    return init_params(model, jax.random.PRNGKey(0))


def _signals(rng, lens):
    return [
        (rng.normal(0, 30, size=n) + 400).astype(np.float32) for n in lens
    ]


@pytest.mark.slow
def test_strip_matrices_match_window_assembly(params, rng):
    """Assembled matrices from both prep paths agree to float tolerance."""
    lens = [5000, 1024, 700, 2049, 4096]
    sigs = _signals(rng, lens)
    bc_w = Basecaller(params, options=BasecallOptions(
        read_batch=len(sigs), prep_mode="windows"))
    bc_s = Basecaller(params, options=BasecallOptions(
        read_batch=len(sigs), prep_mode="strips"))

    bucket = 8192
    n = len(sigs)
    padded = np.zeros((n, bucket), np.float32)
    lengths = np.array(lens, np.int32)
    for j, s in enumerate(sigs):
        padded[j, : len(s)] = s

    from radian_tpu.ops.preprocess import max_windows_for

    probs, n_wins, pad_ends, _ = bc_w._prep(
        params, jnp.asarray(padded), jnp.asarray(lengths),
        max_windows=max_windows_for(bucket, 1024, 128),
    )
    from radian_tpu.ops.assembly import assemble_matrices

    mats_w, t_w = jax.vmap(
        lambda p, nw, pe: assemble_matrices(
            p, nw, pe, step=128, window=1024, out_len=bucket, mode="first"
        )
    )(probs, n_wins, pad_ends)

    mats_s, t_s, _ = bc_s._prep_strips(
        params, jnp.asarray(padded), jnp.asarray(lengths),
        n_strips=bucket // 128,
    )
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_s))
    np.testing.assert_allclose(
        np.asarray(mats_s), np.asarray(mats_w), rtol=0, atol=1e-6
    )

    bc_f = Basecaller(params, options=BasecallOptions(
        read_batch=len(sigs), prep_mode="fullread"))
    mats_f, t_f, _ = bc_f._prep_fullread(
        params, jnp.asarray(padded), jnp.asarray(lengths)
    )
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_f))
    np.testing.assert_allclose(
        np.asarray(mats_f), np.asarray(mats_w), rtol=0, atol=1e-6
    )


@pytest.mark.slow
def test_strip_path_decodes_identically(params, rng):
    """End-to-end: basecall_signals output is identical across prep modes."""
    lens = [3000, 900, 5121]
    sigs = _signals(rng, lens)
    sigs.append(np.full(2000, 7.0, np.float32))  # MAD=0 → skip in both
    seqs = {}
    for mode in ("windows", "strips", "fullread"):
        bc = Basecaller(params, options=BasecallOptions(
            read_batch=4, prep_mode=mode))
        seqs[mode] = bc.basecall_signals(sigs)
    assert seqs["windows"] == seqs["strips"]
    assert seqs["windows"] == seqs["fullread"]
    assert seqs["windows"][-1] is None  # skip propagated


def test_strips_rejected_when_invalid(params):
    for mode in ("strips", "fullread"):
        with pytest.raises(ValueError):
            Basecaller(params, options=BasecallOptions(
                prep_mode=mode, decode_type="chunk"))
        with pytest.raises(ValueError):
            Basecaller(params, options=BasecallOptions(
                prep_mode=mode, assembly_mode="mean"))
    # auto falls back silently for chunk decode
    bc = Basecaller(params, options=BasecallOptions(decode_type="chunk"))
    assert not bc.use_strips and not bc.use_fullread
    # auto prefers the fullread forward when valid
    bc = Basecaller(params, options=BasecallOptions())
    assert bc.use_fullread and not bc.use_strips
