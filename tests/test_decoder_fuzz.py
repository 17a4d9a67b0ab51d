"""Cross-implementation fuzz: oracle vs XLA scan vs native C++ engine.

Every decoded string from both of our decoder implementations must match
the reference oracle across randomized shapes, peakednesses, widths and
LM configurations.
"""

import numpy as np
import pytest

# fuzz-heavy
pytestmark = pytest.mark.slow

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_native import beam_search_native, native_seq
from radian_tpu.ops.beam_search import beam_search_batch, labels_to_seq
from tests import reference_oracle as oracle
from tests.test_beam_search import _DenseDictView


def test_fuzz_all_decoders(rng):
    ref = oracle.decode()
    lm3 = build_dense_tables(
        random_kmer_model(rng, context_len=3, concentration=0.25), 3
    )
    lm3_dict = _DenseDictView(lm3)

    # override for extended fuzz sessions: RADIAN_FUZZ_CASES=300
    import os

    n_cases = int(os.environ.get("RADIAN_FUZZ_CASES", 14))
    if os.environ.get("RADIAN_FUZZ_SEED"):
        import numpy as _np

        rng = _np.random.default_rng(int(os.environ["RADIAN_FUZZ_SEED"]))
    # every case compiles a distinct (t, width, lm) program; hundreds of
    # live CPU executables in one process eventually segfault the XLA
    # compiler (observed at a 500-case run), so bound the cache
    import jax
    for case in range(n_cases):
        t = int(rng.integers(2, 70))
        alpha = float(rng.choice([0.15, 0.5, 1.0]))
        width = int(rng.choice([2, 4, 6]))
        use_lm = bool(case % 2)
        if case and case % 50 == 0:
            jax.clear_caches()
        mats = rng.dirichlet(np.full(5, alpha), size=(1, t)).astype(np.float32)
        lengths = np.asarray([t], np.int32)
        s_thr, r_thr = 0.4, 1.1

        want = ref.beam_search(
            mats[0].astype(np.float64), "ACGT", width,
            lm3_dict if use_lm else None,
            s_thr if use_lm else None, r_thr if use_lm else None,
            3 if use_lm else None, {} if use_lm else None,
        )

        kw = dict(beam_width=width)
        if use_lm:
            kw.update(lm_probs=lm3.probs, lm_ent=lm3.entropy,
                      s_threshold=s_thr, r_threshold=r_thr, ctx_len=3,
                      lm_enabled=True)
        rev, _, _ = beam_search_batch(mats, lengths, **kw)
        got_xla = labels_to_seq(np.asarray(rev[0]), reverse=True)

        nkw = dict(beam_width=width)
        if use_lm:
            nkw.update(lm=lm3, s_threshold=s_thr, r_threshold=r_thr,
                       ctx_len=3)
        nrev, nlens, _ = beam_search_native(mats, lengths, **nkw)
        got_native = native_seq(nrev[0], int(nlens[0]), reverse=True)

        assert got_xla == want, (
            f"XLA case {case} (t={t} a={alpha} w={width} lm={use_lm}): "
            f"{got_xla!r} != {want!r}"
        )
        assert got_native == want, (
            f"native case {case} (t={t} a={alpha} w={width} lm={use_lm}): "
            f"{got_native!r} != {want!r}"
        )
