"""Configuration system.

Loads YAML configs with attribute access, schema-compatible with the
reference's ``radian/models/sig2seq.yaml`` (see reference
``radian/utilities.py:16-18`` which wraps yaml in an AttrDict).  The
default config shipped at ``radian_tpu/configs/sig2seq.yaml`` carries the
same hyperparameter values as the reference spec.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Mapping

import yaml

_DEFAULT_CONFIG_PATH = Path(__file__).parent / "configs" / "sig2seq.yaml"


class DotDict(dict):
    """A dict with attribute access, recursively applied to nested mappings."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, Mapping) and not isinstance(v, DotDict):
            return cls(v)
        if isinstance(v, list):
            return [cls._wrap(x) for x in v]
        return v

    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value):
        self[name] = self._wrap(value)

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, DotDict):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, DotDict) else x for x in v]
            else:
                out[k] = v
        return out

    def copy(self) -> "DotDict":
        return DotDict(copy.deepcopy(self.to_dict()))


def get_config(path: str | Path | None = None) -> DotDict:
    """Load a YAML model/train config.

    With no argument, loads the bundled default (reference parity:
    ``radian/models/sig2seq.yaml``).
    """
    p = Path(path) if path is not None else _DEFAULT_CONFIG_PATH
    with open(p) as f:
        raw = yaml.safe_load(f)
    return DotDict(raw)


def default_config() -> DotDict:
    return get_config(None)
