"""Python bindings for the native FLAC codec."""

from __future__ import annotations

import ctypes

import numpy as np

from . import load_library


def _lib():
    lib = load_library("polgen_flac", ["flac_codec.cpp"])
    if not getattr(lib, "_flac_configured", False):
        lib.polgen_flac_probe.restype = ctypes.c_int
        lib.polgen_flac_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.polgen_flac_read.restype = ctypes.c_int
        lib.polgen_flac_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.polgen_flac_encode.restype = ctypes.c_int64
        lib.polgen_flac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib._flac_configured = True
    return lib


def decode(path: str):
    """.flac file -> ((T, C) float32, sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    lib = _lib()
    total = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    off = lib.polgen_flac_probe(
        data, len(data), ctypes.byref(total), ctypes.byref(channels),
        ctypes.byref(rate), ctypes.byref(bits),
    )
    if off < 0:
        raise ValueError(f"{path}: not a decodable FLAC stream (err {off})")
    n = int(total.value)
    if n == 0:  # unknown length: over-allocate from stream size
        n = len(data) * 8 // (bits.value * channels.value) + 65536
    out = np.zeros(n * channels.value, np.float32)
    rc = lib.polgen_flac_read(
        data, len(data), off, channels.value, bits.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if rc != 0:
        raise ValueError(f"{path}: FLAC decode failed (err {rc})")
    return out.reshape(-1, channels.value), int(rate.value)


def encode(path: str, samples: np.ndarray, sample_rate: int):
    """(T,) or (T, C) float32 -> .flac file (16-bit, fixed predictors)."""
    samples = np.asarray(samples, np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.float32:
        samples = samples.astype(np.float32)
    inter = np.ascontiguousarray(samples)
    n, c = inter.shape
    lib = _lib()
    bound = lib.polgen_flac_encode(
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c,
        sample_rate, None, 0,
    )
    buf = ctypes.create_string_buffer(int(bound))
    size = lib.polgen_flac_encode(
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c,
        sample_rate, ctypes.cast(buf, ctypes.c_char_p), bound,
    )
    if size < 0:
        raise RuntimeError("FLAC encode buffer overflow")
    with open(path, "wb") as f:
        f.write(buf.raw[:size])
    return path
