"""Streaming basecall: in-order flush, batch dispatch, bounded state."""

import numpy as np

from radian_tpu.io.fast5 import Fast5Read
from radian_tpu.io.fasta import read_fasta
from radian_tpu.pipeline import Basecaller, BasecallOptions
from tests.test_pipeline_parity import shared_params, signals  # noqa: F401


def test_streaming_matches_batch_mode(shared_params, signals, tmp_path):  # noqa: F811
    reads = [
        Fast5Read(read_id=f"r{i:02d}", signal=s[:2000])
        for i, s in enumerate(signals[:2] * 3)
    ]
    bc = Basecaller(shared_params, options=BasecallOptions(read_batch=2))

    out_a = tmp_path / "batch"
    out_b = tmp_path / "stream"
    bc.basecall_directory(None, out_a, verbose=False, reads=reads)
    bc.basecall_directory(None, out_b, verbose=False, reads=iter(reads),
                          streaming=True)

    a = read_fasta(out_a / "reads-0.fasta")
    b = read_fasta(out_b / "reads-0.fasta")
    assert a == b
    assert len(a) == 6
    # streaming preserved input order in the fasta
    order = [l[1:].strip() for l in (out_b / "reads-0.fasta").read_text()
             .splitlines() if l.startswith(">")]
    assert order == [r.read_id for r in reads]
