"""Temporal convolutional network backbone.

Architecture spec reproduced from the reference's config + the keras-tcn
3.5 semantics it delegates to (reference radian/model.py:52-75,
radian/models/sig2seq.yaml:38-49; see SURVEY.md §2.2):

- ``nb_stacks × len(dilations)`` residual blocks, dilation cycling through
  ``dilations`` per stack.
- Each block: two dilated Conv1D(``nb_filters``, ``kernel_size``) with
  causal left padding, each followed by activation (and optional batch
  norm / spatial dropout); a 1×1 conv shortcut where in/out channels
  differ (only the first block here: 1 → 256); output activation applied
  to the residual sum.
- ``use_skip_connections`` sums every block's conv-branch output instead
  of taking the last block's residual output.
- ``return_sequences=False`` keeps only the final timestep.

With the default config this gives a receptive field of
``1 + 2*(k-1)*sum(dilations) = 253`` samples and 2,167,040 backbone
parameters.

TPU notes: convolutions lower to XLA ``conv_general_dilated`` which maps
onto the MXU; the time axis stays dense (static 1024) so XLA can tile
freely.  An optional ``compute_dtype=bfloat16`` runs conv math on the MXU
native dtype while keeping parameters and the residual sums in float32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CausalConv1D(nn.Module):
    """Dilated 1-D convolution with causal (left-only) padding."""

    features: int
    kernel_size: int
    dilation: int = 1
    padding: str = "causal"  # 'causal' or 'same'
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == "causal":
            pad = [((self.kernel_size - 1) * self.dilation, 0)]
        else:
            pad = "SAME"
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=pad,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)


class ResidualBlock(nn.Module):
    filters: int
    kernel_size: int
    dilation: int
    padding: str = "causal"
    dropout_rate: float = 0.0
    use_batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inputs = x
        for i in range(2):
            x = CausalConv1D(
                self.filters,
                self.kernel_size,
                self.dilation,
                self.padding,
                self.compute_dtype,
                name=f"conv{i}",
            )(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.relu(x)
            if self.dropout_rate > 0.0:
                x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        if inputs.shape[-1] != self.filters:
            inputs = nn.Conv(
                features=self.filters,
                kernel_size=(1,),
                kernel_init=nn.initializers.he_normal(),
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="shortcut",
            )(inputs)
        branch = x
        out = nn.relu(
            inputs.astype(jnp.float32) + branch.astype(jnp.float32)
        ).astype(self.compute_dtype)
        return out, branch


class TCN(nn.Module):
    nb_filters: int = 256
    kernel_size: int = 3
    nb_stacks: int = 1
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 32)
    padding: str = "causal"
    use_skip_connections: bool = False
    dropout_rate: float = 0.0
    return_sequences: bool = True
    use_batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        skips = []
        block = 0
        for _ in range(self.nb_stacks):
            for d in self.dilations:
                x, branch = ResidualBlock(
                    self.nb_filters,
                    self.kernel_size,
                    d,
                    self.padding,
                    self.dropout_rate,
                    self.use_batch_norm,
                    self.compute_dtype,
                    name=f"block{block}",
                )(x, train=train)
                skips.append(branch)
                block += 1
        if self.use_skip_connections:
            x = sum(s.astype(jnp.float32) for s in skips).astype(self.compute_dtype)
        if not self.return_sequences:
            x = x[:, -1, :]
        return x

    @property
    def receptive_field(self) -> int:
        return 1 + 2 * (self.kernel_size - 1) * self.nb_stacks * sum(self.dilations)
