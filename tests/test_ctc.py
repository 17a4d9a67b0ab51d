"""CTC loss cross-checked against optax and torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radian_tpu.ops.ctc import ctc_loss


def _case(rng, b=4, t=50, c=5, u_max=12):
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    label_lens = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    labels = rng.integers(0, c - 1, size=(b, u_max)).astype(np.int32)
    input_lens = rng.integers(2 * u_max + 1, t + 1, size=b).astype(np.int32)
    return np.asarray(log_probs), input_lens, labels, label_lens


def test_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    log_probs, in_lens, labels, lab_lens = _case(rng)
    ours = np.asarray(
        ctc_loss(jnp.asarray(log_probs), jnp.asarray(in_lens),
                 jnp.asarray(labels), jnp.asarray(lab_lens), blank_id=4)
    )
    lp_t = torch.tensor(log_probs).permute(1, 0, 2)  # [T, B, C]
    theirs = F.ctc_loss(
        lp_t, torch.tensor(labels), torch.tensor(in_lens),
        torch.tensor(lab_lens), blank=4, reduction="none",
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_matches_optax(rng):
    import optax

    log_probs, in_lens, labels, lab_lens = _case(rng)
    b, t, c = log_probs.shape
    u = labels.shape[1]
    # optax wants blank=0 and paddings; remap classes: blank 4 -> 0, base i -> i+1
    perm = np.array([4, 0, 1, 2, 3])
    lp_optax = log_probs[..., perm]
    logit_pad = (np.arange(t)[None, :] >= in_lens[:, None]).astype(np.float32)
    label_pad = (np.arange(u)[None, :] >= lab_lens[:, None]).astype(np.float32)
    theirs = np.asarray(
        optax.ctc_loss(
            jnp.asarray(lp_optax), jnp.asarray(logit_pad),
            jnp.asarray(labels + 1), jnp.asarray(label_pad), blank_id=0,
        )
    )
    ours = np.asarray(
        ctc_loss(jnp.asarray(log_probs), jnp.asarray(in_lens),
                 jnp.asarray(labels), jnp.asarray(lab_lens), blank_id=4)
    )
    # optax's implementation uses a log_epsilon=-1e5 scheme that perturbs
    # values at the ~1e-2 level on random inputs
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=2e-2)


def test_gradients_match_torch(rng):
    """torch's ctc_loss backward returns the gradient w.r.t. *logits*
    (it assumes its input came from log_softmax), so compare gradients of
    the composed logits → log_softmax → ctc chain."""
    import torch
    import torch.nn.functional as F

    b, t, c, u_max = 2, 30, 5, 6
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    lab_lens = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    labels = rng.integers(0, c - 1, size=(b, u_max)).astype(np.int32)
    in_lens = rng.integers(2 * u_max + 1, t + 1, size=b).astype(np.int32)

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            lp, jnp.asarray(in_lens), jnp.asarray(labels),
            jnp.asarray(lab_lens), blank_id=4,
        ).sum()

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    lg_t = torch.tensor(logits, requires_grad=True)
    loss = F.ctc_loss(
        torch.log_softmax(lg_t, dim=-1).permute(1, 0, 2),
        torch.tensor(labels), torch.tensor(in_lens),
        torch.tensor(lab_lens), blank=4, reduction="sum",
    )
    loss.backward()
    g_theirs = lg_t.grad.numpy()
    np.testing.assert_allclose(g_ours, g_theirs, rtol=1e-3, atol=1e-4)

    # and the analytic gradient agrees with a numerical probe
    eps = 1e-3
    probe = logits.copy()
    probe[0, 5, 2] += eps
    num = (loss_fn(jnp.asarray(probe)) - loss_fn(jnp.asarray(logits))) / eps
    assert abs(float(num) - g_ours[0, 5, 2]) < 2e-2


def test_perfect_alignment_low_loss():
    """Peaked logits spelling the label via CTC alignment → loss ≈ 0."""
    t, c = 12, 5
    labels = np.array([[0, 1, 2]], np.int32)
    path = [4, 0, 4, 1, 4, 2, 4, 4, 4, 4, 4, 4]  # blank-interleaved
    logits = np.full((1, t, c), -20.0, np.float32)
    for i, s in enumerate(path):
        logits[0, i, s] = 20.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    loss = ctc_loss(lp, jnp.asarray([t]), jnp.asarray(labels),
                    jnp.asarray([3]), blank_id=4)
    assert float(loss[0]) < 1e-3


def test_impossible_label_high_loss():
    """Label longer than input allows → astronomically high loss."""
    t = 5
    labels = np.array([[0, 0, 0]], np.int32)  # repeats need blanks: needs T>=5
    lp = jax.nn.log_softmax(jnp.zeros((1, t, 5)), -1)
    loss = ctc_loss(lp, jnp.asarray([4]), jnp.asarray(labels),
                    jnp.asarray([3]), blank_id=4)
    assert float(loss[0]) > 1e5  # unreachable -> ~NEG_INF
