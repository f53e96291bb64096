"""Quality metrics: mel distortion (the BASELINE acceptance metric).

The reference stack is stochastic at three sites (latent noise, NSF noise,
SineGen noise — SURVEY §7.6), so bitwise parity is impossible; quality
acceptance is mel distortion in dB between two renditions (target: < 0.5 dB
vs the PyTorch reference on real checkpoints; used here to bound numerics
between fp32/bf16/kernel paths on identical seeds)."""

from __future__ import annotations

import numpy as np

from ..ops.audio import log_mel_spectrogram, mel_filterbank


def mel_distortion_db(a: np.ndarray, b: np.ndarray, sr: int,
                      *, n_mels: int = 80, n_fft: int = 1024,
                      hop: int = 256) -> float:
    """Mean absolute log-mel difference in dB between two waveforms."""
    import jax.numpy as jnp

    n = min(len(a), len(b))
    a = np.asarray(a[:n], np.float32)
    b = np.asarray(b[:n], np.float32)
    if a.dtype == np.int16 or np.abs(a).max() > 1.5:
        a = a / 32768.0
    if b.dtype == np.int16 or np.abs(b).max() > 1.5:
        b = b / 32768.0
    basis = mel_filterbank(sr=sr, n_fft=n_fft, n_mels=n_mels, fmax=sr / 2)
    ma = np.asarray(log_mel_spectrogram(jnp.asarray(a[None]), basis,
                                        n_fft=n_fft, hop_length=hop))
    mb = np.asarray(log_mel_spectrogram(jnp.asarray(b[None]), basis,
                                        n_fft=n_fft, hop_length=hop))
    # natural-log mel -> dB (20/ln 10 per amplitude ratio unit)
    return float(np.mean(np.abs(ma - mb)) * (20.0 / np.log(10.0)))
