"""The sig2seq signal model: TCN backbone + dense head.

Reproduces the reference network (reference radian/model.py:52-89):
``Input(1024, 1) → TCN → Dense(relu_units) → ReLU → Dense(softmax_units)
→ softmax``, emitting a per-timestep distribution over
{A, C, G, U, blank} with no temporal downsampling (1024×5 per window).

Unlike the reference, training does not wire the CTC loss into the graph
as a Lambda output layer (reference model.py:77-87); the loss lives in
``radian_tpu.ops.ctc`` and is composed functionally in the train step.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from radian_tpu.config import DotDict, default_config
from radian_tpu.models.tcn import TCN


class SigToSeq(nn.Module):
    """TCN + dense head.  ``__call__`` returns log-probabilities by default.

    Log-probs are the natural unit for CTC loss and log-space beam search;
    use ``probs=True`` for reference-style softmax output.
    """

    relu_units: int = 128
    softmax_units: int = 5
    nb_filters: int = 256
    kernel_size: int = 3
    nb_stacks: int = 1
    dilations: tuple = (1, 2, 4, 8, 16, 32)
    padding: str = "causal"
    use_skip_connections: bool = False
    dropout_rate: float = 0.0
    return_sequences: bool = True
    use_batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, probs: bool = False):
        x = x.astype(self.compute_dtype)
        x = TCN(
            nb_filters=self.nb_filters,
            kernel_size=self.kernel_size,
            nb_stacks=self.nb_stacks,
            dilations=tuple(self.dilations),
            padding=self.padding,
            use_skip_connections=self.use_skip_connections,
            dropout_rate=self.dropout_rate,
            return_sequences=self.return_sequences,
            use_batch_norm=self.use_batch_norm,
            compute_dtype=self.compute_dtype,
            name="tcn",
        )(x, train=train)
        x = nn.Dense(
            self.relu_units,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="dense_relu",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.softmax_units,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="dense_out",
        )(x)
        logits = x.astype(jnp.float32)
        if probs:
            return jax.nn.softmax(logits, axis=-1)
        return jax.nn.log_softmax(logits, axis=-1)


def build_model(config: DotDict | None = None, compute_dtype=jnp.float32) -> SigToSeq:
    """Construct a SigToSeq from a config (defaults to reference parity)."""
    cfg = config if config is not None else default_config()
    m = cfg.model
    return SigToSeq(
        relu_units=m.relu_units,
        softmax_units=m.softmax_units,
        nb_filters=m.tcn.nb_filters,
        kernel_size=m.tcn.kernel_size,
        nb_stacks=m.tcn.nb_stacks,
        dilations=tuple(m.tcn.dilations),
        padding=m.tcn.padding,
        use_skip_connections=m.tcn.use_skip_connections,
        dropout_rate=m.tcn.dropout_rate,
        return_sequences=m.tcn.return_sequences,
        use_batch_norm=m.tcn.use_batch_norm,
        compute_dtype=compute_dtype,
    )


def init_params(model: SigToSeq, rng: jax.Array, window_size: int = 1024):
    """Initialise parameters for a ``[B, window, 1]`` input.

    Jitted as ONE program: un-jitted flax init dispatches every layer's
    rng/init op eagerly — over a remote (axon) backend each eager op is a
    ~0.5 s round trip, ~15 s total for this model (measured round 4).
    """
    dummy = jnp.zeros((1, window_size, 1), jnp.float32)
    return jax.jit(lambda r: model.init(r, dummy))(rng)["params"]


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
