"""Tests for fast5 ingestion and fasta output."""

import numpy as np

from radian_tpu.io import FastaWriter, iter_fast5_reads, read_fasta


EXPECTED_LENGTHS = {12833, 4863, 11388, 14799, 9905}


def test_iter_fast5_reads_bundled(reads_fast5_path):
    reads = list(iter_fast5_reads(reads_fast5_path))
    assert len(reads) == 5
    assert {r.signal.shape[0] for r in reads} == EXPECTED_LENGTHS
    for r in reads:
        assert r.signal.dtype == np.int16
        assert len(r.read_id) == 36  # uuid
        assert r.sampling_rate == 3012.0


def test_fasta_writer_rollover(tmp_path):
    with FastaWriter(tmp_path, reads_per_file=2) as w:
        for i in range(5):
            w.write(f"read{i}", "ACGT" * (i + 1))
    files = sorted(p.name for p in tmp_path.glob("*.fasta"))
    assert files == ["reads-0.fasta", "reads-1.fasta", "reads-2.fasta"]
    merged = {}
    for p in sorted(tmp_path.glob("*.fasta")):
        merged.update(read_fasta(p))
    assert merged == {f"read{i}": "ACGT" * (i + 1) for i in range(5)}
