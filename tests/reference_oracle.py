"""Import the reference radian modules as test oracles.

The reference at /root/reference is used read-only, at test time only, to
check that our from-scratch implementation reproduces its observable
behavior.  No reference code is copied into this repo; modules are loaded
by file path under namespaced module names.
"""

import importlib.util
import sys
from pathlib import Path

_REF = Path("/root/reference/radian")


def _load(name: str, filename: str):
    mod_name = f"radian_reference_{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(mod_name, _REF / filename)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_available() -> bool:
    return _REF.exists()


def preprocess():
    return _load("preprocess", "preprocess.py")


def decode():
    return _load("decode", "decode.py")


def matrix_assembly():
    return _load("matrix_assembly", "matrix_assembly.py")


def sequence_assembly():
    return _load("sequence_assembly", "sequence_assembly.py")
