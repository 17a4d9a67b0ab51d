"""Global-mode matrix assembly: stitch overlapping per-window softmax
matrices into one full-read matrix, on device.

The reference implementation (reference radian/matrix_assembly.py:6-53)
builds a python list-of-lists then "averages" overlapping distributions —
but its ``average_dist`` discards the result of ``np.add``, so the
stitched row at read-timestep ``t`` is actually the distribution from the
*earliest-starting* window covering ``t``: L1-normalised when more than
one window overlaps, verbatim when exactly one.  That behavior is the
parity spec (SURVEY.md §2.2 component 6) and is the default ``mode="first"``
here; ``mode="mean"`` provides the presumably-intended true average.

The TPU formulation is closed-form: for output timestep ``t`` the earliest
covering window is ``i0 = max(0, (t - window)//step + 1)`` and the cover
count is ``min(t//step, n_windows-1) - i0 + 1``, so assembly is one
vectorised gather + masked normalise — no host round-trips between the
model and the full-read beam search.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit, static_argnames=("step", "window", "out_len", "mode")
)
def assemble_matrices(
    matrices,
    n_windows,
    pad_end,
    *,
    step: int = 128,
    window: int = 1024,
    out_len: int,
    mode: str = "first",
):
    """Stitch ``[max_windows, window, C]`` window outputs for one read.

    Args:
      matrices: model outputs per window; rows >= ``n_windows`` ignored.
      n_windows: true window count (tail window last).
      pad_end: zero-pad length of the tail window (>= 1); the tail
        window's final ``pad_end`` timesteps are trimmed (reference
        basecall.py:96).
      out_len: static output length bound (>= signal length).

    Returns:
      ``(assembled [out_len, C] f32, t_read)`` with rows >= ``t_read``
      zeroed.
    """
    c = matrices.shape[-1]
    t = jnp.arange(out_len, dtype=jnp.int32)
    t_read = (n_windows - 1) * step + window - pad_end

    i0 = jnp.clip((t - window) // step + 1, 0, n_windows - 1)
    i_hi = jnp.minimum(t // step, n_windows - 1)
    count = i_hi - i0 + 1

    if mode == "first":
        rows = matrices[i0, t - i0 * step]  # [out_len, C]
        s = rows.sum(-1, keepdims=True)
        rows = jnp.where((count[:, None] > 1) & (s > 0), rows / s, rows)
    elif mode == "mean":
        max_cover = window // step + 1
        acc = jnp.zeros((out_len, c), jnp.float32)
        for k in range(max_cover):
            i = i0 + k
            ok = (i <= i_hi)[:, None]
            off = jnp.clip(t - i * step, 0, window - 1)
            acc = acc + jnp.where(ok, matrices[jnp.minimum(i, n_windows - 1), off], 0.0)
        rows = acc / count[:, None]
        s = rows.sum(-1, keepdims=True)
        rows = jnp.where(s > 0, rows / s, rows)
    else:
        raise ValueError(f"unknown assembly mode {mode!r}")

    return jnp.where((t < t_read)[:, None], rows, 0.0), t_read


def assemble_matrices_np(matrices: list[np.ndarray], step: int,
                         mode: str = "first") -> np.ndarray:
    """Host-side assembly of a trimmed matrix list (reference-shaped API).

    ``matrices`` is a list of ``[T_i, C]`` arrays (tail already trimmed),
    as produced by the reference driver before ``assemble_matrices``.
    """
    window = matrices[0].shape[0]
    n = len(matrices)
    t_read = (n - 1) * step + matrices[-1].shape[0]
    c = matrices[0].shape[1]
    out = np.zeros((t_read, c), np.float32)
    count = np.zeros(t_read, np.int64)
    acc = np.zeros((t_read, c), np.float64)
    first = np.full(t_read, -1, np.int64)
    for i, m in enumerate(matrices):
        lo = i * step
        hi = lo + m.shape[0]
        acc[lo:hi] += m
        newly = first[lo:hi] < 0
        idx = np.nonzero(newly)[0] + lo
        first[idx] = i
        out[idx] = m[idx - lo]
        count[lo:hi] += 1
    if mode == "first":
        multi = count > 1
        s = out[multi].sum(-1, keepdims=True)
        nz = (s > 0).ravel()
        rows = out[multi]
        rows[nz] = rows[nz] / s[nz]
        out[multi] = rows
        return out
    rows = (acc / count[:, None]).astype(np.float32)
    s = rows.sum(-1, keepdims=True)
    return np.where(s > 0, rows / s, rows)
