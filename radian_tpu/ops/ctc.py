"""CTC loss as a jitted log-space forward recursion.

Replaces the reference's ``tf.keras.backend.ctc_batch_cost`` C++ kernel
(reference radian/model.py:4,91-98) with a native JAX implementation that
compiles to a single fused XLA loop on TPU and differentiates through
``jax.grad`` — no custom backward needed, the forward-algorithm VJP is
exact.

Formulation: for a label sequence ``y`` of length ``U``, build the
extended sequence ``blank, y1, blank, y2, ..., yU, blank`` (S = 2U+1
states) and run the standard CTC forward recursion over logits time
steps, with the skip transition allowed when the state two back is a
different non-blank label.  All shapes are static; padding in both time
and label dimensions is masked.

Cross-checked in tests against ``optax.ctc_loss`` and torch's
``F.ctc_loss``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite -inf proxy keeps grads NaN-free


def _extend_labels(labels, blank_id: int):
    """[B, U] labels → [B, 2U+1] extended blank-interleaved states."""
    b, u = labels.shape
    ext = jnp.full((b, 2 * u + 1), blank_id, labels.dtype)
    return ext.at[:, 1::2].set(labels)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(log_probs, input_lengths, labels, label_lengths, blank_id: int = 4):
    """Per-example negative log-likelihood of ``labels`` under CTC.

    Args:
      log_probs: ``[B, T, C]`` log-softmax outputs.
      input_lengths: ``[B]`` valid timestep counts.
      labels: ``[B, U]`` int labels, padded arbitrarily past length.
      label_lengths: ``[B]`` valid label counts.
      blank_id: index of the CTC blank (last class here, as in the
        reference where blank = column 4).

    Returns:
      ``[B]`` float32 losses (−log p(labels | logits)).
    """
    log_probs = log_probs.astype(jnp.float32)
    b, t, c = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1

    labels = labels.astype(jnp.int32)
    ext = _extend_labels(labels, blank_id)  # [B, S]
    s_len = 2 * label_lengths.astype(jnp.int32) + 1  # valid extended states

    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx < s_len[:, None]

    # allowed skip: s -> s+2 when ext[s] != blank and ext[s] != ext[s-2]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    can_skip = (ext != blank_id) & (ext != ext_prev2) & (state_idx >= 2)

    # init: alpha_0 = emit(state 0 = blank) or emit(state 1 = y1)
    init = jnp.full((b, s), NEG_INF, jnp.float32)
    emit0 = log_probs[:, 0, :]
    init = init.at[:, 0].set(emit0[jnp.arange(b), ext[:, 0]])
    first_label_ok = s_len > 1
    init = init.at[:, 1].set(
        jnp.where(
            first_label_ok, emit0[jnp.arange(b), ext[:, jnp.minimum(1, s - 1)]],
            NEG_INF,
        )
    )
    init = jnp.where(state_valid, init, NEG_INF)

    batch_idx = jnp.arange(b)

    # emission lookup as a one-hot masked sum: the obvious gather
    # ``lp_t[batch, ext]`` differentiates to a per-step scatter-add,
    # which serializes on TPU (measured 504 ms of a 549 ms train step at
    # batch 256); the one-hot contraction is exact (log-softmax outputs
    # are finite, masked terms add literal zeros) and its backward is a
    # dense broadcast-multiply
    onehot = (
        ext[:, :, None] == jnp.arange(c, dtype=ext.dtype)[None, None, :]
    ).astype(log_probs.dtype)  # [B, S, C]

    def step(alpha, lp_t):
        # lp_t: [B, C]; transition maxima in log space via logaddexp
        stay = alpha
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :s]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :s]
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        combined = jnp.logaddexp(jnp.logaddexp(stay, prev1), prev2)
        emit = (lp_t[:, None, :] * onehot).sum(-1)  # [B, S]
        new_alpha = jnp.where(state_valid, combined + emit, NEG_INF)
        return new_alpha, new_alpha

    # run full T; per-example final alpha is taken at its input_length
    _, alphas = jax.lax.scan(step, init, jnp.swapaxes(log_probs, 0, 1)[1:])
    alphas = jnp.concatenate([init[None], alphas], axis=0)  # [T, B, S]

    final = alphas[input_lengths - 1, batch_idx]  # [B, S]
    end1 = final[batch_idx, s_len - 1]  # last blank
    end2 = jnp.where(
        s_len >= 2, final[batch_idx, jnp.maximum(s_len - 2, 0)], NEG_INF
    )
    ll = jnp.logaddexp(end1, end2)
    return -ll


def ctc_loss_mean(log_probs, input_lengths, labels, label_lengths,
                  blank_id: int = 4):
    """Batch-mean CTC loss (the training objective)."""
    return ctc_loss(
        log_probs, input_lengths, labels, label_lengths, blank_id
    ).mean()
