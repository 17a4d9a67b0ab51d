"""Flat-file parameter checkpoints (npz) + deterministic init.

Orbax handles full training state (see ``radian_tpu.train``); these
light-weight npz checkpoints serve inference, tests, and benchmarks.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def save_params_npz(params, path: str | Path) -> None:
    flat = flatten_dict(jax.tree.map(np.asarray, params), sep="/")
    np.savez(path, **flat)


def load_params_npz(path: str | Path):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
