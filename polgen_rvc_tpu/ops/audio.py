"""Spectral frontend: framing, STFT magnitude, mel filterbanks, log-mel.

Numerics match the reference's frontends:
  - RMVPE: conv-basis STFT with reflect center-padding, periodic hann,
    128 HTK mels (fmin 30, fmax 8000), log clamp 1e-5
    (/root/reference/rvc/lib/predictors/RMVPE.py:35-122, 379-439)
  - FCPE: torch.stft with asymmetric (win-hop)//2 padding, slaney mels,
    magnitude eps 1e-9 (/root/reference/rvc/lib/predictors/FCPE.py:73-159)

The STFT runs as hop-block framing (static slices, zero gathers) followed
by a windowed-DFT matmul on the MXU — measured 20x faster than the
frame-gather + jnp.fft.rfft formulation on v5e (gathers and FFTs are both
weak spots of the TPU lowering; dense matmuls are its strength, which is
also why the reference uses a conv-basis STFT on GPU, RMVPE.py:35-122).
The DFT basis is generated inside the graph from iota (exact integer
phases reduced mod n_fft), so no multi-MB constant bloats the HLO. The
rfft path remains for n_fft too large for a dense basis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# windows and framing
# ---------------------------------------------------------------------------


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (torch.hann_window / scipy get_window fftbins)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def frame_signal(x, frame_length: int, hop_length: int):
    """Frame the last axis into overlapping windows: (..., T) -> (..., N, L).

    N = 1 + (T - frame_length) // hop_length (requires T >= frame_length).
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    return jnp.take(x, idx, axis=-1)


def reflect_pad_last(x, pad_left: int, pad_right: int):
    """np.pad(..., mode="reflect") on the last axis (torch F.pad reflect)."""
    widths = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
    return jnp.pad(x, widths, mode="reflect")


def _frame_by_hop_blocks(x, n_fft: int, hop_length: int):
    """Overlapping frames via hop-block reshape + static slices (no gather).

    x: (..., T) with T >= n_fft. Returns (..., N, n_fft),
    N = 1 + (T - n_fft) // hop_length — identical to frame_signal.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    span = -(-n_fft // hop_length)  # blocks touched by one frame
    n_blocks = span + n_frames - 1  # block i..i+span-1 serve frame i
    need = n_blocks * hop_length
    if need > t:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - t)])
    else:
        x = x[..., :need]
    blocks = x.reshape(x.shape[:-1] + (n_blocks, hop_length))
    wide = jnp.concatenate(
        [blocks[..., i : i + n_frames, :] for i in range(span)], axis=-1
    )  # (..., N, span*hop)
    return wide[..., :n_fft]


def _windowed_dft_magnitude(frames, window, magnitude_eps: float):
    """(..., N, n_fft) frames -> (..., N, n_fft//2+1) |DFT| via two matmuls.

    The cos/sin basis is built in-graph from exact integer phases
    (k*f < 2^24 holds for n_fft <= 4096, and the mod-n reduction keeps the
    trig argument in [0, 2pi), so fp32 is exact to ~1e-7)."""
    n_fft = frames.shape[-1]
    n_bins = n_fft // 2 + 1
    k = jnp.arange(n_fft, dtype=jnp.float32)[:, None]
    f = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    phase = jnp.mod(k * f, float(n_fft)) * (2.0 * np.pi / n_fft)
    win = window.astype(jnp.float32)[:, None]
    cos_b = jnp.cos(phase) * win
    sin_b = jnp.sin(phase) * win
    frames = frames.astype(jnp.float32)
    re = jax.lax.dot_general(
        frames, cos_b, (((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    im = jax.lax.dot_general(
        frames, sin_b, (((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(re * re + im * im + magnitude_eps)


def stft_magnitude(
    x,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window=None,
    center: bool = True,
    pad_left: int | None = None,
    pad_right: int | None = None,
    pad_mode: str = "reflect",
    magnitude_eps: float = 0.0,
):
    """|STFT| of (..., T) -> (..., n_fft//2 + 1, N) (freq-major like torch).

    center=True pads n_fft//2 reflect on both sides (torch.stft center /
    the reference conv-STFT's pad_amount). Explicit pad_left/right override
    center for FCPE's asymmetric (win-hop)//2 scheme.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    window = jnp.asarray(window)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if pad_left is None and pad_right is None and center:
        pad_left = pad_right = n_fft // 2
    pad_left = pad_left or 0
    pad_right = pad_right or 0
    if pad_left or pad_right:
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)],
            mode=pad_mode,
        )

    if n_fft <= 4096:  # dense DFT basis on the MXU (see module docstring)
        frames = _frame_by_hop_blocks(x, n_fft, hop_length)
        mag = _windowed_dft_magnitude(frames, window, magnitude_eps)
    else:
        frames = frame_signal(x, n_fft, hop_length)  # (..., N, n_fft)
        frames = frames * window.astype(frames.dtype)
        spec = jnp.fft.rfft(frames, axis=-1)  # (..., N, n_fft//2+1)
        mag = jnp.sqrt(
            jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + magnitude_eps
        )
    return jnp.swapaxes(mag, -1, -2)  # (..., F, N)


# ---------------------------------------------------------------------------
# mel filterbanks (librosa.filters.mel compatible, host-side numpy constant)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq, htk: bool):
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(
        above,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels, htk: bool):
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(
        above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    *,
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, n_fft//2 + 1). librosa-compatible."""
    fmax = fmax if fmax is not None else sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(
        _hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2
    )
    mel_f = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(dtype)


def log_mel_spectrogram(
    x,
    mel_basis,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    pad_left: int | None = None,
    pad_right: int | None = None,
    pad_mode: str = "reflect",
    clamp: float = 1e-5,
    magnitude_eps: float = 0.0,
):
    """log(clamp(mel @ |STFT|)): (..., T) -> (..., n_mels, N)."""
    mag = stft_magnitude(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        center=center,
        pad_left=pad_left,
        pad_right=pad_right,
        pad_mode=pad_mode,
        magnitude_eps=magnitude_eps,
    )
    mel = jnp.einsum("mf,...fn->...mn", jnp.asarray(mel_basis, mag.dtype), mag)
    return jnp.log(jnp.clip(mel, min=clamp))
