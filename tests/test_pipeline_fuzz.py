"""Randomized-config end-to-end parity fuzz: pipeline vs the reference.

Each case draws a random decode configuration (mode, beam width, LM
on/off, thresholds, context length) and a random slice of a real
signal, and asserts the decoded string equals the reference pipeline
(oracle modules + shared weights).  Complements the fixed parity
matrix in test_pipeline_parity.py with configuration-space coverage.

Scale up with RADIAN_FUZZ_CASES (default 6; each case costs a CPU
forward + a pure-python oracle decode over ~2k samples).
"""

import os

import numpy as np
import pytest
import jax

# fuzz-heavy
pytestmark = pytest.mark.slow

from radian_tpu.io import iter_fast5_reads
from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions
from tests.test_beam_search import _DenseDictView
from tests.test_pipeline_parity import _reference_pipeline


def test_fuzz_pipeline_configs(rng, reads_fast5_path):
    n_cases = int(os.environ.get("RADIAN_FUZZ_CASES", 6))
    if os.environ.get("RADIAN_FUZZ_SEED"):
        import numpy as _np

        rng = _np.random.default_rng(int(os.environ["RADIAN_FUZZ_SEED"]))
    reads = sorted(
        iter_fast5_reads(reads_fast5_path), key=lambda r: len(r.signal)
    )
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lms = {
        ctx: build_dense_tables(
            random_kmer_model(rng, context_len=ctx, concentration=0.3),
            ctx,
        )
        for ctx in (2, 4)
    }

    for case in range(n_cases):
        decode_type = str(rng.choice(["global", "chunk"]))
        width = int(rng.choice([2, 6, 8, 9]))
        use_lm = decode_type == "global" and bool(rng.integers(0, 2))
        ctx = int(rng.choice([2, 4]))
        s_thr = float(rng.choice([0.3, 0.5, 0.8]))
        r_thr = float(rng.choice([0.5, 1.1]))
        r = reads[int(rng.integers(0, len(reads)))]
        start = int(rng.integers(0, max(len(r.signal) - 2400, 1)))
        sig = r.signal[start : start + int(rng.integers(1200, 2400))]

        lm = lms[ctx] if use_lm else None
        expected = _reference_pipeline(
            sig, params, decode_type,
            lm=_DenseDictView(lm) if use_lm else None,
            s_thr=s_thr if use_lm else 0.5,
            r_thr=r_thr if use_lm else 0.5,
            ctx_len=ctx if use_lm else 11,
            beam_width=width,
        )
        bc = Basecaller(
            params, lm=lm,
            options=BasecallOptions(
                decode_type=decode_type, beam_width=width,
                sig_threshold=s_thr, rna_threshold=r_thr,
                context_len=ctx if use_lm else 11,
                read_batch=1, bucket_quantum=1024,
            ),
        )
        got = bc.basecall_signals([sig])[0]
        assert got == expected, (
            f"case {case}: {decode_type} w={width} lm={use_lm} ctx={ctx} "
            f"thr=({s_thr},{r_thr}) len={len(sig)}: "
            f"got {len(got)}b, want {len(expected)}b"
        )
