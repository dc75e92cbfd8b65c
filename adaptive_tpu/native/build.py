"""Build the native shared libraries (g++, cached by mtime)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "masklib.cpp")
LIB = os.path.join(_DIR, "libmask.so")
JSON_SRC = os.path.join(_DIR, "jsonlib.cpp")
JSON_LIB = os.path.join(_DIR, "libcocojson.so")


def _build(src: str, lib: str, force: bool) -> str:
    if (
        force
        or not os.path.exists(lib)
        or os.path.getmtime(lib) < os.path.getmtime(src)
    ):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib]
        subprocess.run(cmd, check=True, capture_output=True)
    return lib


def ensure_built(force: bool = False) -> str:
    return _build(SRC, LIB, force)


def ensure_json_built(force: bool = False) -> str:
    return _build(JSON_SRC, JSON_LIB, force)
