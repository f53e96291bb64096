"""Native (C++) host-side components, built on demand with g++.

The reference's native capability lived in third-party libraries
(pedalboard/JUCE for effects, libsndfile, ffmpeg — SURVEY §2.3); here the
equivalent DSP is first-party C++ streamed through ctypes. The build is a
single g++ invocation, cached next to the source; a missing toolchain
degrades with a clear error from the call sites that need it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


class NativeBuildError(RuntimeError):
    pass


def _build(name: str, sources: list[str]) -> str:
    so_path = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
        os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs
    ):
        return so_path
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise NativeBuildError("g++ not found; native DSP unavailable") from e
    except subprocess.CalledProcessError as e:
        raise NativeBuildError(f"native build failed:\n{e.stderr}") from e
    return so_path


def load_library(name: str, sources: list[str]) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name, sources))
        return _LIBS[name]


def viterbi_library() -> ctypes.CDLL:
    lib = load_library("polgen_viterbi", ["viterbi.cpp"])
    if not getattr(lib, "_polgen_configured", False):
        common = [
            ctypes.c_int64,                   # T
            ctypes.c_int32,                   # n_bins
            ctypes.POINTER(ctypes.c_double),  # band (n_bins, 2*half+1)
            ctypes.c_int32,                   # half
            ctypes.c_double,                  # log_eps
            ctypes.c_double,                  # log_init
            ctypes.POINTER(ctypes.c_int32),   # path_out (T,)
        ]
        lib.polgen_viterbi_banded.restype = None
        lib.polgen_viterbi_banded.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # log_obs (T, n_bins)
        ] + common
        lib.polgen_viterbi_banded_probs.restype = None
        lib.polgen_viterbi_banded_probs.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # probs (T, n_bins)
        ] + common
        lib._polgen_configured = True
    return lib


def dsp_library() -> ctypes.CDLL:
    lib = load_library("polgen_dsp", ["dsp.cpp"])
    if not getattr(lib, "_polgen_configured", False):
        lib.polgen_chain_create.restype = ctypes.c_void_p
        lib.polgen_chain_create.argtypes = [ctypes.c_double] + [ctypes.c_float] * 18
        lib.polgen_chain_process.restype = None
        lib.polgen_chain_process.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.polgen_chain_destroy.restype = None
        lib.polgen_chain_destroy.argtypes = [ctypes.c_void_p]
        lib._polgen_configured = True
    return lib
