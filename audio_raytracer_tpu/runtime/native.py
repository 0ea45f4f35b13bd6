"""Build + load the native C++ scene registry (ctypes binding).

The shared library is compiled from native/scene_registry.cpp on first
use (g++ only; no external deps) and cached next to the package.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "scene_registry.cpp"
_BUILD_DIR = pathlib.Path(__file__).resolve().parent / "_build"
_LIB = _BUILD_DIR / "libaudio_rt_scene.so"

_lock = threading.Lock()
_lib = None


def _compile() -> None:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if stale) the native registry library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not _LIB.exists()
                or (_SRC.exists()
                    and _SRC.stat().st_mtime > _LIB.stat().st_mtime)):
            _compile()
        lib = ctypes.CDLL(str(_LIB))

        lib.art_registry_create.restype = ctypes.c_void_p
        lib.art_registry_destroy.argtypes = [ctypes.c_void_p]
        lib.art_add.restype = ctypes.c_int64
        lib.art_add.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_float)]
        lib.art_update.restype = ctypes.c_int
        lib.art_update.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_float)]
        lib.art_remove.restype = ctypes.c_int
        lib.art_remove.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.art_handle_slot.restype = ctypes.c_int
        lib.art_handle_slot.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.art_add_target.restype = ctypes.c_int
        lib.art_add_target.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                       ctypes.c_float, ctypes.c_float]
        lib.art_set_target_position.restype = ctypes.c_int
        lib.art_set_target_position.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float]
        lib.art_remove_target.restype = ctypes.c_int
        lib.art_remove_target.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.art_update_job_batch.restype = ctypes.c_int
        lib.art_update_job_batch.argtypes = [ctypes.c_void_p]
        lib.art_version.restype = ctypes.c_uint64
        lib.art_version.argtypes = [ctypes.c_void_p]
        lib.art_counts.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int)]
        lib.art_job_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.art_job_data.argtypes = [ctypes.c_void_p, ctypes.c_int]

        _lib = lib
        return lib
