"""Signal preprocessing: MAD normalisation + overlapped windowing.

Semantics match the reference (reference radian/preprocess.py):

- ``mad_normalise`` computes the modified z-score
  ``(x - median) / (1.4826 * MAD)`` clipped to ``±outlier_clip``
  (reference preprocess.py:24-49).  An empty signal or a zero MAD is a
  per-read error (the basecall driver skips such reads, reference
  basecall.py:77-81).
- ``get_windows`` slides a ``window_size`` window by ``step_size`` while a
  full window fits, then always appends one zero-padded tail window
  starting at the next step offset; ``pad_end >= 1`` always (reference
  preprocess.py:4-22).

The device versions operate on fixed-shape, length-padded buffers so that
one jitted program serves a whole length bucket: variable read lengths are
rounded up to a bucket size on the host, and every shape below is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAD_SCALE = 1.4826  # consistency constant: MAD -> sigma for normal data


# ---------------------------------------------------------------------------
# Host (numpy) reference path — exact semantics, arbitrary shapes.
# ---------------------------------------------------------------------------

def mad_normalise_np(signal: np.ndarray, outlier_clip: float) -> np.ndarray:
    """Host-side modified z-score normalisation (float64, like the reference)."""
    if signal.shape[0] == 0:
        raise ValueError("Signal must not be empty to normalise")
    median = np.median(signal)
    mad = np.median(np.abs(signal - median))
    if mad == 0:
        raise ValueError("MAD is zero, issue with signal.")
    z = (signal - median) / (MAD_SCALE * mad)
    return np.clip(z, -outlier_clip, outlier_clip)


def get_windows_np(signal: np.ndarray, window_size: int, step_size: int):
    """Host-side overlapped windowing; returns ``(windows, pad_end)``."""
    if step_size <= 0:
        raise ValueError("Step size must be > 0")
    if step_size > window_size:
        raise ValueError("Step size must be <= window size")
    length = signal.shape[0]
    n_full = max((length - window_size) // step_size + 1, 0)
    tail_start = n_full * step_size
    tail = signal[tail_start:]
    pad_end = window_size - tail.shape[0]

    n_windows = n_full + 1
    windows = np.zeros((n_windows, window_size), dtype=signal.dtype)
    if n_full > 0:
        idx = (
            np.arange(n_full)[:, None] * step_size + np.arange(window_size)[None, :]
        )
        windows[:n_full] = signal[idx]
    windows[n_full, : tail.shape[0]] = tail
    return windows, pad_end


# ---------------------------------------------------------------------------
# Device (jax) path — static shapes, masked by true length.
# ---------------------------------------------------------------------------

def _masked_median(sorted_vals: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Median of the first ``n`` entries of an ascending-sorted vector."""
    lo = sorted_vals[jnp.maximum((n - 1) // 2, 0)]
    hi = sorted_vals[jnp.maximum(n // 2, 0)]
    return 0.5 * (lo + hi)


@functools.partial(jax.jit, static_argnames=("outlier_clip",))
def mad_normalise(signal, length, outlier_clip: float = 4.0):
    """Device MAD normalisation of a length-padded signal.

    Args:
      signal: ``[L_pad]`` float32; entries at index >= ``length`` ignored.
      length: scalar int32, true signal length (> 0).
      outlier_clip: symmetric clip for the modified z-score.

    Returns:
      ``(normalised [L_pad] f32, mad scalar f32)`` — the caller must treat
      ``mad == 0`` as a skip-this-read error (reference raises ValueError).
    """
    signal = signal.astype(jnp.float32)
    n = signal.shape[0]
    valid = jnp.arange(n) < length
    big = jnp.float32(jnp.inf)
    median = _masked_median(jnp.sort(jnp.where(valid, signal, big)), length)
    dev = jnp.abs(signal - median)
    mad = _masked_median(jnp.sort(jnp.where(valid, dev, big)), length)
    z = (signal - median) / (MAD_SCALE * mad)
    z = jnp.clip(z, -outlier_clip, outlier_clip)
    return jnp.where(valid, z, 0.0), mad


@functools.partial(
    jax.jit, static_argnames=("window_size", "step_size", "max_windows")
)
def window_signal(signal, length, window_size: int, step_size: int, max_windows: int):
    """Device overlapped windowing of a length-padded signal.

    Returns ``(windows [max_windows, window_size], n_windows, pad_end)``.
    Rows at index >= ``n_windows`` are duplicates of the tail window and
    must be masked by the caller.
    """
    n_full = jnp.maximum((length - window_size) // step_size + 1, 0)
    n_windows = n_full + 1
    tail_start = n_full * step_size
    pad_end = window_size - (length - tail_start)

    starts = jnp.minimum(
        jnp.arange(max_windows, dtype=jnp.int32) * step_size, tail_start
    )
    idx = starts[:, None] + jnp.arange(window_size, dtype=jnp.int32)[None, :]
    in_signal = idx < length
    gathered = signal[jnp.minimum(idx, length - 1)]
    windows = jnp.where(in_signal, gathered, 0.0)
    return windows, n_windows, pad_end


@functools.partial(
    jax.jit, static_argnames=("step_size", "ctx", "n_strips")
)
def strip_signal(signal, length, step_size: int, ctx: int, n_strips: int):
    """Uniform strip view of a normalised signal for the fast forward path.

    Strip ``j`` covers absolute positions ``[j*step - ctx, j*step + step)``
    (out-of-range positions zeroed), so a causal conv over the strip
    reproduces — exactly — the reference window conv's values at output
    positions ``[j*step, (j+1)*step)`` provided ``ctx >= receptive_field-1``
    (in-window history is identical; positions < 0 are zero in both).  The
    caller keeps each strip's last ``step`` outputs and concatenates: that
    IS the global-mode "first"-assembled matrix (see ops/assembly.py and
    reference radian/matrix_assembly.py:46-53), because the earliest window
    covering timestep t supplies offset ``window-step + t%step`` for
    t >= window and offset t (window 0) below — both reduce to "the model's
    causal output at absolute position t with zero history before 0".
    """
    strip_len = ctx + step_size
    starts = jnp.arange(n_strips, dtype=jnp.int32) * step_size - ctx
    idx = starts[:, None] + jnp.arange(strip_len, dtype=jnp.int32)[None, :]
    ok = (idx >= 0) & (idx < length)
    gathered = signal[jnp.clip(idx, 0, signal.shape[0] - 1)]
    return jnp.where(ok, gathered, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_size", "step_size", "ctx", "n_strips", "outlier_clip"
    ),
)
def preprocess_read_strips(
    signal,
    length,
    window_size: int = 1024,
    step_size: int = 128,
    ctx: int = 256,
    n_strips: int = 1,
    outlier_clip: float = 4.0,
):
    """Fused normalise + strip windowing (fast global-mode forward).

    Returns ``(strips [n_strips, ctx+step], n_windows, pad_end, mad)`` —
    ``n_windows``/``pad_end`` follow the reference window accounting
    (preprocess.py:4-22) and are needed for trim/renormalise downstream.
    """
    norm, mad = mad_normalise(signal, length, outlier_clip=outlier_clip)
    n_full = jnp.maximum((length - window_size) // step_size + 1, 0)
    n_windows = n_full + 1
    tail_start = n_full * step_size
    pad_end = window_size - (length - tail_start)
    strips = strip_signal(norm, length, step_size, ctx, n_strips)
    return strips, n_windows, pad_end, mad


def bucket_length(length: int, quantum: int = 4096) -> int:
    """Round a read length up to the bucket used for jit shape caching."""
    return max(((length + quantum - 1) // quantum) * quantum, quantum)


def max_windows_for(bucket: int, window_size: int, step_size: int) -> int:
    """Static upper bound on window count for a signal of length ``bucket``."""
    n_full = max((bucket - window_size) // step_size + 1, 0)
    return n_full + 1


@functools.partial(
    jax.jit, static_argnames=("window_size", "step_size", "max_windows", "outlier_clip")
)
def preprocess_read(
    signal,
    length,
    window_size: int = 1024,
    step_size: int = 128,
    max_windows: int = 1,
    outlier_clip: float = 4.0,
):
    """Fused device preprocessing: normalise then window one read.

    Returns ``(windows, n_windows, pad_end, mad)``; caller checks
    ``mad != 0`` and masks windows past ``n_windows``.
    """
    norm, mad = mad_normalise(signal, length, outlier_clip=outlier_clip)
    windows, n_windows, pad_end = window_signal(
        norm, length, window_size, step_size, max_windows
    )
    return windows, n_windows, pad_end, mad
