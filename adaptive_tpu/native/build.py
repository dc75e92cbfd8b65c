"""Build the native masklib shared library (g++, cached by mtime)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "masklib.cpp")
LIB = os.path.join(_DIR, "libmask.so")


def ensure_built(force: bool = False) -> str:
    if (
        force
        or not os.path.exists(LIB)
        or os.path.getmtime(LIB) < os.path.getmtime(SRC)
    ):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    return LIB
