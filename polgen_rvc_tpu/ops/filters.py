"""IIR filtering: Butterworth high-pass + zero-phase filtfilt.

The reference applies a 5th-order 48 Hz Butterworth high-pass with
scipy.signal.filtfilt before chunking (/root/reference/rvc/infer/
pipeline.py:19-22, 329). Coefficient design happens on host (scipy);
application is available both host-side (scipy, exact reference parity) and
as a jittable second-order-sections cascade for in-graph use — direct-form
transfer functions of this filter are numerically unstable in fp32, SOS is
the stable formulation.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps


@lru_cache(maxsize=8)
def butter_highpass(order: int = 5, cutoff_hz: float = 48.0, fs: float = 16000.0):
    """(b, a) for the reference's high-pass (pipeline.py:22)."""
    b, a = _sps.butter(N=order, Wn=cutoff_hz, btype="high", fs=fs)
    return b.astype(np.float64), a.astype(np.float64)


@lru_cache(maxsize=8)
def butter_highpass_sos(order: int = 5, cutoff_hz: float = 48.0, fs: float = 16000.0):
    sos = _sps.butter(N=order, Wn=cutoff_hz, btype="high", fs=fs, output="sos")
    return sos.astype(np.float64)


@lru_cache(maxsize=8)
def _filtfilt_native_setup(key):
    """(ctypes fn, b, a, zi_unit, padlen) for the native filtfilt, or None
    when the toolchain is unavailable."""
    import ctypes

    b, a = (np.array(v) for v in key)
    try:
        from ..native import dsp_library

        lib = dsp_library()
        fn = lib.polgen_filtfilt
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
    except Exception:
        return None
    zi = _sps.lfilter_zi(b, a)
    padlen = 3 * max(len(a), len(b))
    return fn, b, a, zi, padlen


def highpass_filtfilt_pad_quant(x: np.ndarray, t_pad: int, bucket: int,
                                fs: float = 16000.0):
    """Fused conversion head: zero-phase high-pass -> float32 -> reflect
    pad by t_pad -> int16 quantize against the padded signal's max, one
    C++ pass (native/dsp.cpp). Returns (filtered f32 (n,), int16
    (bucket,) with zero tail, inv_scale f32) or None when the native
    library or preconditions are unavailable (callers run the 3-step
    python path; both produce bit-identical values)."""
    import ctypes

    b, a = butter_highpass(fs=fs)
    setup = _filtfilt_native_setup((tuple(b), tuple(a)))
    if setup is None:
        return None
    fn_ff, bb, aa, zi, padlen = setup
    n = int(x.shape[0])
    if x.ndim != 1 or n <= padlen or t_pad >= n or n + 2 * t_pad > bucket:
        return None
    try:
        from ..native import dsp_library

        lib = dsp_library()
        fn = lib.polgen_filtfilt_pad_quant
    except Exception:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    sp = ctypes.POINTER(ctypes.c_int16)
    fn.restype = ctypes.c_int
    xd = np.ascontiguousarray(x, np.float64)
    out_f32 = np.empty(n, np.float32)
    out_i16 = np.zeros(bucket, np.int16)
    inv = ctypes.c_float()
    rc = fn(
        xd.ctypes.data_as(dp), ctypes.c_int64(n),
        np.ascontiguousarray(bb).ctypes.data_as(dp),
        np.ascontiguousarray(aa).ctypes.data_as(dp),
        ctypes.c_int(len(aa) - 1),
        np.ascontiguousarray(zi).ctypes.data_as(dp),
        ctypes.c_int64(padlen), ctypes.c_int64(t_pad),
        out_f32.ctypes.data_as(fp), out_i16.ctypes.data_as(sp),
        ctypes.byref(inv),
    )
    if rc != 0:
        return None
    return out_f32, out_i16, np.float32(inv.value)


def highpass_filtfilt(x: np.ndarray, fs: float = 16000.0) -> np.ndarray:
    """Host-side zero-phase high-pass, bit-identical to the reference step.

    Runs the first-party C++ filtfilt (native/dsp.cpp — same odd
    extension, lfilter_zi conditions, and DF2T recurrence as scipy, in
    double) and falls back to scipy when the toolchain is missing or the
    signal is shorter than the edge extension."""
    import ctypes

    b, a = butter_highpass(fs=fs)
    setup = _filtfilt_native_setup((tuple(b), tuple(a)))
    if setup is not None:
        fn, bb, aa, zi, padlen = setup
        xd = np.ascontiguousarray(x, np.float64)
        if xd.ndim == 1 and xd.shape[0] > padlen:
            out = np.empty_like(xd)
            dp = ctypes.POINTER(ctypes.c_double)
            rc = fn(
                xd.ctypes.data_as(dp), xd.shape[0],
                np.ascontiguousarray(bb).ctypes.data_as(dp),
                np.ascontiguousarray(aa).ctypes.data_as(dp),
                len(aa) - 1,
                np.ascontiguousarray(zi).ctypes.data_as(dp),
                padlen,
                out.ctypes.data_as(dp),
            )
            if rc == 0:
                return out
    return _sps.filtfilt(b, a, x)


# ---------------------------------------------------------------------------
# jittable SOS cascade as lax.scan (for in-graph chains / streaming)
# ---------------------------------------------------------------------------


def sosfilt(x, sos, zi=None):
    """Cascaded-biquad filtering along the last axis.

    x: (..., T); sos: (n_sections, 6) scipy layout [b0 b1 b2 a0 a1 a2].
    zi: (n_sections, ..., 2) initial conditions. Returns (y, zf).
    """
    sos = jnp.asarray(sos, x.dtype)
    n_sections = sos.shape[0]
    lead = x.shape[:-1]
    if zi is None:
        zi = jnp.zeros((n_sections,) + lead + (2,), x.dtype)

    y = x
    zf = []
    for s in range(n_sections):
        b0, b1, b2, _, a1, a2 = [sos[s, i] for i in range(6)]

        def step(z, xt, b0=b0, b1=b1, b2=b2, a1=a1, a2=a2):
            z0, z1 = z[..., 0], z[..., 1]
            yt = b0 * xt + z0
            z0n = b1 * xt + z1 - a1 * yt
            z1n = b2 * xt - a2 * yt
            return jnp.stack([z0n, z1n], axis=-1), yt

        z_end, ys = jax.lax.scan(step, zi[s], jnp.moveaxis(y, -1, 0))
        y = jnp.moveaxis(ys, 0, -1)
        zf.append(z_end)
    return y, jnp.stack(zf)


@lru_cache(maxsize=8)
def _sosfilt_zi(key):
    sos = np.array(key).reshape(-1, 6)
    return _sps.sosfilt_zi(sos)


def sosfiltfilt_jax(x, sos, edge: int | None = None):
    """Zero-phase SOS filtering with odd edge extension (filtfilt semantics).

    Transfer-function-equal to scipy.signal.filtfilt on the same design;
    parity asserted in tests at fp32 tolerance.
    """
    sos_np = np.asarray(sos, np.float64)
    if edge is None:
        # scipy's exact default padlen; the filter's poles sit near DC so the
        # startup transient is long-lived and parity requires the same padlen
        ntaps = 2 * sos_np.shape[0] + 1
        ntaps -= min(
            int((sos_np[:, 2] == 0).sum()), int((sos_np[:, 5] == 0).sum())
        )
        edge = 3 * ntaps
    left = 2 * x[..., :1] - x[..., edge:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -2 - edge : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    zi_unit = jnp.asarray(_sosfilt_zi(tuple(sos_np.reshape(-1))), x.dtype)
    # zi shape (ns, 2) -> broadcast to leading dims of x
    lead = x.shape[:-1]
    zi_unit = zi_unit.reshape((zi_unit.shape[0],) + (1,) * len(lead) + (2,))

    y, _ = sosfilt(ext, sos, zi=zi_unit * ext[..., :1][None])
    y = jnp.flip(y, -1)
    y, _ = sosfilt(y, sos, zi=zi_unit * y[..., :1][None])
    y = jnp.flip(y, -1)
    return y[..., edge:-edge]


def filtfilt_jax(x, b=None, a=None, *, sos=None):
    """Zero-phase high-pass; accepts (b, a) for API parity but filters via SOS."""
    if sos is None:
        # re-derive an SOS factorization of the given transfer function
        if b is None or a is None:
            sos = butter_highpass_sos()
        else:
            z, p, k = _sps.tf2zpk(np.asarray(b, np.float64), np.asarray(a, np.float64))
            sos = _sps.zpk2sos(z, p, k)
    return sosfiltfilt_jax(x, np.asarray(sos, np.float64))
