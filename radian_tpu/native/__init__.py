"""Native (C++) runtime components, built on demand with g++.

Libraries are compiled into ``radian_tpu/native/build/`` the first time
they are requested and cached afterwards.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_BUILD = _DIR / "build"


def build_library(name: str, sources: list[str] | None = None,
                  extra_flags: list[str] | None = None) -> Path:
    """Compile ``<name>.cc`` into ``build/lib<name>.so`` (cached)."""
    sources = sources or [f"{name}.cc"]
    out = _BUILD / f"lib{name}.so"
    srcs = [_DIR / s for s in sources]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return out
    _BUILD.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *(extra_flags or []),
        *[str(s) for s in srcs],
        "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out
