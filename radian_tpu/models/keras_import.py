"""Keras .h5 weight import/export for sig2seq checkpoints.

The reference trains with Keras and checkpoints weights-only HDF5 files
(reference radian/train.py:72-78, ``model-{epoch:02d}.h5``; loaded at
radian/model.py:42-45).  Any radian checkpoint therefore maps 1:1 onto
our flax parameter tree:

  keras ``tcn/residual_block_<i>/conv1D_<j>``   → ``tcn/block<i>/conv<j>/Conv_0``
  keras ``tcn/residual_block_0/matching_conv1D`` → ``tcn/block0/shortcut``
  keras ``dense`` / ``dense_1``                  → ``dense_relu`` / ``dense_out``

Keras Conv1D kernels are ``[k, in, out]`` and Dense kernels ``[in, out]``
— identical to flax — so no transposition is needed.  The importer is
name-pattern driven with shape validation; the exporter writes the same
layout so checkpoints round-trip and can be handed back to a
reference-stack user.
"""

from __future__ import annotations

import re
from pathlib import Path

import h5py
import numpy as np

from radian_tpu.config import DotDict, default_config


def _collect_weights(path: str | Path) -> list[tuple[str, np.ndarray]]:
    """Collect (name, array) pairs from a keras save_weights h5 file."""
    out: list[tuple[str, np.ndarray]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in root.attrs.get("layer_names", list(root.keys()))
        ]
        for lname in layer_names:
            if lname not in root:
                continue
            grp = root[lname]
            wnames = [
                n.decode() if isinstance(n, bytes) else n
                for n in grp.attrs.get("weight_names", [])
            ]
            if not wnames:  # fall back to recursive dataset walk
                wnames = []
                grp.visit(
                    lambda n: wnames.append(n)
                    if isinstance(grp[n], h5py.Dataset)
                    else None
                )
            for wn in wnames:
                out.append((wn, np.asarray(grp[wn])))
    return out


def load_keras_h5(path: str | Path, config: DotDict | None = None):
    """Load a keras weights-only .h5 into our flax param tree."""
    cfg = config if config is not None else default_config()
    n_blocks = cfg.model.tcn.nb_stacks * len(cfg.model.tcn.dilations)

    weights = _collect_weights(path)
    params: dict = {"tcn": {}}
    dense_kernels: list[np.ndarray] = []
    dense_biases: list[np.ndarray] = []

    for name, arr in weights:
        kind = "kernel" if "kernel" in name else ("bias" if "bias" in name else None)
        if kind is None:
            continue
        m = re.search(r"residual_block_(\d+)", name)
        if m:
            block = int(m.group(1))
            bkey = f"block{block}"
            params["tcn"].setdefault(bkey, {})
            if re.search(r"matching|shortcut|1x1", name):
                params["tcn"][bkey].setdefault("shortcut", {})[kind] = arr
            else:
                cm = re.search(r"conv1 ?D?_(\d+)", name, re.IGNORECASE)
                conv = int(cm.group(1)) if cm else None
                if conv is None:
                    existing = params["tcn"][bkey]
                    conv = 0 if "conv0" not in existing or kind in existing.get(
                        "conv0", {}
                    ).get("Conv_0", {}) else 1
                ckey = f"conv{conv}"
                params["tcn"][bkey].setdefault(ckey, {}).setdefault("Conv_0", {})[
                    kind
                ] = arr
        elif "dense" in name.lower():
            (dense_kernels if kind == "kernel" else dense_biases).append(arr)

    if len(dense_kernels) != 2 or len(dense_biases) != 2:
        raise ValueError(
            f"expected 2 dense layers, found {len(dense_kernels)} kernels / "
            f"{len(dense_biases)} biases in {path}"
        )
    # the relu head comes before the softmax head in keras layer order
    params["dense_relu"] = {"kernel": dense_kernels[0], "bias": dense_biases[0]}
    params["dense_out"] = {"kernel": dense_kernels[1], "bias": dense_biases[1]}

    _validate(params, cfg, n_blocks)
    return params


def _validate(params, cfg, n_blocks):
    t = cfg.model.tcn
    for i in range(n_blocks):
        bkey = f"block{i}"
        b = params["tcn"].get(bkey)
        if b is None:
            raise ValueError(f"missing weights for {bkey}")
        for j in range(2):
            k = b[f"conv{j}"]["Conv_0"]["kernel"]
            if k.shape[0] != t.kernel_size or k.shape[2] != t.nb_filters:
                raise ValueError(f"{bkey}/conv{j} kernel shape {k.shape}")
        if i == 0 and "shortcut" not in b:
            raise ValueError("block0 missing shape-match (1x1) conv")
    if params["dense_relu"]["kernel"].shape[1] != cfg.model.relu_units:
        raise ValueError("dense_relu shape mismatch")
    if params["dense_out"]["kernel"].shape[1] != cfg.model.softmax_units:
        raise ValueError("dense_out shape mismatch")


def export_keras_h5(params, path: str | Path) -> None:
    """Write our params in the keras save_weights layout (round-trips
    through :func:`load_keras_h5`; consumable by the reference stack)."""
    tcn = params["tcn"]
    blocks = sorted(tcn.keys(), key=lambda k: int(k.removeprefix("block")))
    with h5py.File(path, "w") as f:
        layer_names = ["inputs", "tcn", "dense", "activation", "dense_1",
                       "activation_1"]
        f.attrs["layer_names"] = [n.encode() for n in layer_names]
        for ln in layer_names:
            f.create_group(ln)

        tgrp = f["tcn"]
        wnames = []
        for bi, bkey in enumerate(blocks):
            b = tcn[bkey]
            for j in range(2):
                for kind in ("kernel", "bias"):
                    name = f"tcn/residual_block_{bi}/conv1D_{j}/{kind}:0"
                    tgrp.create_dataset(
                        name, data=np.asarray(b[f"conv{j}"]["Conv_0"][kind])
                    )
                    wnames.append(name)
            if "shortcut" in b:
                for kind in ("kernel", "bias"):
                    name = f"tcn/residual_block_{bi}/matching_conv1D/{kind}:0"
                    tgrp.create_dataset(
                        name, data=np.asarray(b["shortcut"][kind])
                    )
                    wnames.append(name)
        tgrp.attrs["weight_names"] = [n.encode() for n in wnames]

        for lname, pkey in (("dense", "dense_relu"), ("dense_1", "dense_out")):
            grp = f[lname]
            wnames = []
            for kind in ("kernel", "bias"):
                name = f"{lname}/{kind}:0"
                grp.create_dataset(name, data=np.asarray(params[pkey][kind]))
                wnames.append(name)
            grp.attrs["weight_names"] = [n.encode() for n in wnames]
        for empty in ("inputs", "activation", "activation_1"):
            f[empty].attrs["weight_names"] = []
