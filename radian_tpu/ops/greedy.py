"""Greedy CTC decoding + edit distance (training-time quality metric).

The reference scaffolds an edit-distance callback but its body is
commented out because the training graph only exposes the loss
(reference radian/train.py:25-46).  Here the model is functional, so
greedy decoding of validation batches is a one-liner away: argmax per
timestep, collapse repeats, drop blanks — then Levenshtein distance to
the label.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def greedy_labels(log_probs):
    """[B, T, C] log-probs → ([B, T] argmax labels, [B, T] keep mask).

    keep marks positions that survive CTC collapse: not blank and not a
    repeat of the previous timestep's argmax.
    """
    am = jnp.argmax(log_probs, axis=-1)
    blank = log_probs.shape[-1] - 1
    prev = jnp.pad(am[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = (am != blank) & (am != prev)
    return am, keep


def greedy_decode(log_probs, input_lengths=None) -> list[np.ndarray]:
    """Decode a batch to python label arrays."""
    am, keep = greedy_labels(log_probs)
    am = np.asarray(am)
    keep = np.asarray(keep)
    out = []
    for b in range(am.shape[0]):
        k = keep[b]
        if input_lengths is not None:
            k = k & (np.arange(am.shape[1]) < int(input_lengths[b]))
        out.append(am[b][k])
    return out


def edit_distance(a, b) -> int:
    """Levenshtein distance between two int sequences."""
    a = np.asarray(a)
    b = np.asarray(b)
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = np.empty(len(b) + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        for j in range(1, len(b) + 1):
            cur[j] = min(cur[j - 1] + 1, prev[j] + 1, sub[j - 1])
        prev = cur
    return int(prev[-1])


def batch_mean_edit_distance(log_probs, labels, label_lengths,
                             input_lengths=None) -> float:
    """Mean normalised edit distance over a batch (0 = perfect)."""
    decoded = greedy_decode(log_probs, input_lengths)
    dists = []
    for b, d in enumerate(decoded):
        truth = np.asarray(labels[b][: int(label_lengths[b])])
        dists.append(edit_distance(d, truth) / max(len(truth), 1))
    return float(np.mean(dists)) if dists else float("nan")
