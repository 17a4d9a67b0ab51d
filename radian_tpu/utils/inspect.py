"""Dataset introspection & timing utilities.

Counterparts of the reference's dev helpers (reference
radian/utilities.py:20-148): dataset iteration timing, steps-per-epoch
counting, label statistics, and label↔sequence rendering.
"""

from __future__ import annotations

import json
import time
from collections import Counter

BASES = "ACGT"


def benchmark_dataset(dataset, max_batches: int | None = None) -> float:
    """Time one pass over a dataset; returns seconds elapsed
    (reference utilities.py:20-25)."""
    t0 = time.perf_counter()
    for i, _ in enumerate(dataset):
        if max_batches is not None and i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    print(f"execution time: {dt}")
    return dt


def count_steps_per_epoch(dataset) -> int:
    """Count batches in one epoch (reference utilities.py:27-32 /
    train.py STEPS_PER_EPOCH tables)."""
    n = 0
    for _ in dataset:
        n += 1
    return n


def label_to_sequence(label, label_length) -> str:
    """Int labels → base string (reference utilities.py:89-93)."""
    return "".join(BASES[int(b)] for b in label[: int(label_length)])


def get_label_stats(dataset, out_path: str | None = None) -> dict:
    """Histogram of label sequences over a dataset
    (reference utilities.py:98-116)."""
    counts: Counter = Counter()
    for batch in dataset:
        for lab, ln in zip(batch["labels"], batch["label_length"]):
            counts[label_to_sequence(lab, ln)] += 1
    stats = dict(counts)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(stats, f)
    return stats
