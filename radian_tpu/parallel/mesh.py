"""Device meshes and sharding rules.

The reference's only distributed strategy is synchronous multi-worker
data parallelism over gRPC (reference radian/train.py:123-133).  The
TPU-native formulation is a ``jax.sharding.Mesh`` with a ``data`` axis
(batch sharding; gradient psum rides ICI) and an optional ``model`` axis
(tensor-parallel sharding of conv output channels and dense units via
GSPMD) — parameters annotated with NamedSharding, collectives inserted
by XLA.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh; ``data=None`` uses all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel parameter shardings over the 'model' axis.

    Conv kernels ``[k, in, out]`` and dense kernels ``[in, out]`` shard
    their output dimension over 'model' when divisible; matching biases
    shard too; everything else replicates.  With model=1 this is fully
    replicated — the data-parallel configuration.
    """
    msize = mesh.shape["model"]

    def spec_for(path, x):
        if msize > 1 and x.ndim >= 1 and x.shape[-1] % msize == 0:
            name = "/".join(str(p.key) for p in path)
            if x.ndim >= 2 and ("kernel" in name):
                return NamedSharding(
                    mesh, P(*([None] * (x.ndim - 1)), "model")
                )
            if x.ndim == 1 and "bias" in name and x.shape[-1] >= msize * 8:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
