"""Profiling/throughput utilities."""

import numpy as np

from radian_tpu.utils.profiling import ThroughputMeter


def test_throughput_meter():
    m = ThroughputMeter()
    m.add(10, 100_000)
    m.add(5, 50_000)
    r = m.rates()
    assert m.reads == 15
    assert m.samples == 150_000
    assert r["reads_per_s"] > 0
    assert "15 reads" in repr(m)
