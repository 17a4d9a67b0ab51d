"""Tests for the sig2seq TCN model: shape, parameter count, causality,
receptive field, and conv semantics cross-checked against torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radian_tpu.config import default_config
from radian_tpu.models import SigToSeq, build_model, init_params, param_count


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    return model, params


def test_output_shape_and_normalisation(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, 1))
    probs = model.apply({"params": params}, x, probs=True)
    assert probs.shape == (2, 1024, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    logp = model.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp)), np.asarray(probs), atol=2e-4
    )


def test_param_count_matches_reference_spec(model_and_params):
    # SURVEY.md §2.2: first block 198,400; 5 × 393,728; head 33,541.
    _, params = model_and_params
    assert param_count(params) == 2_200_581


def test_causality(model_and_params):
    """Causal padding: output at t must not depend on inputs > t."""
    model, params = model_and_params
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1024, 1)).astype(np.float32)
    x2 = x.copy()
    t = 500
    x2[0, t + 1 :, 0] += 10.0
    y1 = np.asarray(model.apply({"params": params}, jnp.asarray(x), probs=True))
    y2 = np.asarray(model.apply({"params": params}, jnp.asarray(x2), probs=True))
    np.testing.assert_allclose(y1[0, : t + 1], y2[0, : t + 1], atol=1e-6)
    assert np.abs(y1[0, t + 1 :] - y2[0, t + 1 :]).max() > 1e-4


def test_receptive_field_253(model_and_params):
    """Perturbing input at t affects no output before t and none after
    t + RF - 1 (RF = 253 for the default config)."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 1024, 1)).astype(np.float32)
    x2 = x.copy()
    t = 300
    x2[0, t, 0] += 10.0
    y1 = np.asarray(model.apply({"params": params}, jnp.asarray(x), probs=True))
    y2 = np.asarray(model.apply({"params": params}, jnp.asarray(x2), probs=True))
    diff = np.abs(y1 - y2)[0].max(axis=-1)
    rf = 1 + 2 * (3 - 1) * (1 + 2 + 4 + 8 + 16 + 32)
    assert rf == 253
    assert diff[:t].max() < 1e-6          # causal: nothing before t
    assert diff[t + rf :].max() < 1e-6    # bounded: nothing beyond t + rf - 1
    assert diff[t : t + rf].max() > 1e-5


def test_causal_dilated_conv_matches_torch():
    """Cross-framework check of the causal dilated conv semantics."""
    import torch
    import torch.nn.functional as F

    from radian_tpu.models.tcn import CausalConv1D

    rng = np.random.default_rng(2)
    B, T, Cin, Cout, K, D = 2, 64, 3, 5, 3, 4
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)

    conv = CausalConv1D(features=Cout, kernel_size=K, dilation=D)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y_jax = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))

    kernel = np.asarray(params["Conv_0"]["kernel"])  # [K, Cin, Cout]
    bias = np.asarray(params["Conv_0"]["bias"])
    w_t = torch.tensor(kernel.transpose(2, 1, 0))  # [Cout, Cin, K]
    x_t = torch.tensor(x.transpose(0, 2, 1))  # [B, Cin, T]
    x_t = F.pad(x_t, ((K - 1) * D, 0))
    y_t = F.conv1d(x_t, w_t, torch.tensor(bias), dilation=D)
    y_torch = y_t.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y_jax, y_torch, atol=1e-5)


def test_return_sequences_false_and_skip_connections():
    cfg = default_config()
    cfg.model.tcn.return_sequences = False
    cfg.model.tcn.use_skip_connections = True
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), window_size=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 256, 1))
    y = model.apply({"params": params}, x, probs=True)
    assert y.shape == (3, 5)
