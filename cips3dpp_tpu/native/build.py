"""Build the native data loader (g++ -O3 -shared), cached next to the source.

The reference JIT-builds its CUDA ops at import (torch cpp_extension,
exp/op/fused_act.py:11); same convention here for the host-side C++."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataloader.cpp")
_LIB = os.path.join(_DIR, "libcips3d_dataloader.so")


def native_lib_path() -> str:
    return _LIB


def build_native(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB
