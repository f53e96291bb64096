"""Polyphase windowed-sinc resampling (librosa.resample capability).

Used for: arbitrary input rate -> 16 kHz pipeline rate (reference
rvc/lib/my_utils.py:12), optional output resample (pipeline.py:454-455), and
FCPE's cached-kernel resampler (FCPE.py:770-777).

Direct polyphase evaluation: output sample i at input-time t_i = i*down/up is
y[i] = sum_q x[j*down + q] * h(p*down/up - q)   with  i = j*up + p,
i.e. one strided conv1d with `up` output channels (one per phase) — a single
MXU-friendly conv, no zero-stuffing and no audio-rate scatter.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .conv import conv1d


@lru_cache(maxsize=32)
def _polyphase_kernel(
    orig_sr: int, target_sr: int, zeros: int = 24, rolloff: float = 0.945
):
    """Kaiser-windowed sinc kernel bank, shape (up, 1, 2W+1), and (up, down, W)."""
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    # cutoff in cycles per *input* sample
    fc = rolloff * 0.5 * min(1.0, up / down)
    half_width = int(math.ceil(zeros / (2.0 * fc))) + 1
    beta = 14.769656459379492  # kaiser beta for ~180 dB sidelobes (np.kaiser ref)

    # phase p's taps are centered at t = p*down/up which spans [0, down), so
    # the shared kernel support must cover q in [-W, down-1+W]
    q = np.arange(-half_width, down + half_width, dtype=np.float64)
    kernels = np.zeros((up, 1, q.size), dtype=np.float64)
    for p in range(up):
        t = p * down / up - q  # taps for phase p
        x = 2.0 * fc * t
        sinc = np.where(x == 0.0, 1.0, np.sin(np.pi * x) / (np.pi * np.where(x == 0, 1, x)))
        u = t / half_width
        win = np.where(
            np.abs(u) <= 1.0,
            np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - u**2))) / np.i0(beta),
            0.0,
        )
        kernels[p, 0] = 2.0 * fc * sinc * win
    return up, down, half_width, kernels.astype(np.float32)


def resample(x, orig_sr: int, target_sr: int):
    """Resample the last axis from orig_sr to target_sr; (..., T) -> (..., T')."""
    if orig_sr == target_sr:
        return jnp.asarray(x)
    x = jnp.asarray(x)
    up, down, w, kernel = _polyphase_kernel(int(orig_sr), int(target_sr))
    t = x.shape[-1]
    out_len = int(math.ceil(t * up / down))

    shape = x.shape
    xr = x.reshape((-1, 1, t))
    y = conv1d(xr, jnp.asarray(kernel, x.dtype), stride=down, padding=w)
    # y: (B, up, J); interleave phases: out[j*up + p] = y[p, j]
    y = jnp.swapaxes(y, 1, 2).reshape(y.shape[0], -1)
    y = y[:, :out_len]
    return y.reshape(shape[:-1] + (out_len,))
