"""Profiling & throughput instrumentation.

The reference's only instrumentation is a per-read wall-clock print
(reference basecall.py:125-131) and a dataset timer (utilities.py:20-25).
Here: jax.profiler trace capture around any callable plus running
reads/s / samples/s counters used by the pipeline and trainer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/radian_tpu_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Running reads/s and samples/s counters."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.reads = 0
        self.samples = 0

    def add(self, reads: int, samples: int) -> None:
        self.reads += reads
        self.samples += samples

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def rates(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "reads_per_s": self.reads / dt,
            "samples_per_s": self.samples / dt,
            "elapsed_s": dt,
        }

    def __repr__(self) -> str:
        r = self.rates()
        return (
            f"{self.reads} reads in {r['elapsed_s']:.2f}s "
            f"({r['reads_per_s']:.2f} reads/s, "
            f"{r['samples_per_s'] / 1e6:.2f} Msamples/s)"
        )
