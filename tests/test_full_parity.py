"""Full-length fasta parity on all 5 bundled reads vs the reference run.

``bench_baseline.py`` runs the actual reference pipeline (oracle modules)
on the full 5-read fast5 with seed-0 weights and the deterministic
synthetic 12-mer LM, storing its fasta to
``bench_data/baseline_fasta.json``.  This test runs our pipeline on the
same inputs and asserts identical sequences.

Gated behind RADIAN_FULL_PARITY=1 (CPU model forward on full reads takes
minutes); run explicitly with:

    RADIAN_FULL_PARITY=1 python -m pytest tests/test_full_parity.py -q
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

requires_full = pytest.mark.skipif(
    os.environ.get("RADIAN_FULL_PARITY") != "1",
    reason="set RADIAN_FULL_PARITY=1 to run full-length parity",
)

BASELINE_FASTA = Path(__file__).parent.parent / "bench_data" / "baseline_fasta.json"


@requires_full
def test_full_reads_match_reference_fasta():
    if not BASELINE_FASTA.exists():
        pytest.skip("run bench_baseline.py first")
    import jax

    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    expected = json.loads(BASELINE_FASTA.read_text())
    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: r.read_id,
    )
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm = build_dense_tables(
        random_kmer_model(np.random.default_rng(42), context_len=11,
                          n_contexts=200_000, concentration=0.2),
        11,
    )
    bc = Basecaller(params, lm=lm, options=BasecallOptions(read_batch=5))
    seqs = bc.basecall_signals([r.signal for r in reads])
    mismatches = {}
    for r, s in zip(reads, seqs):
        if expected[r.read_id] != s:
            exp = expected[r.read_id]
            diff_at = next(
                (k for k, (a, b) in enumerate(zip(exp, s)) if a != b),
                min(len(exp), len(s)),
            )
            mismatches[r.read_id] = (len(exp), len(s) if s else 0, diff_at)
    assert not mismatches, f"fasta mismatches (len_exp, len_got, first_diff): {mismatches}"
