"""CREPE F0 model (torchcrepe "full" capacity) as pure JAX functions.

Replaces the torchcrepe dependency (reference pipeline.py:86-117,
"mangio-crepe" method): six conv blocks over 1024-sample frames with
per-frame normalization, sigmoid over 360 pitch bins, then Viterbi decoding
with a triangular transition and local weighted-average cents.

Batch-norm is folded at conversion; frames batch over the MXU (the frame
batch is the only large dim). Viterbi runs host-side (numpy, O(T*360*25)
via banded transitions).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d
from ..ops.f0_utils import bin_cents_table, cents_to_hz

WINDOW_SIZE = 1024
PITCH_BINS = 360

# torchcrepe "full" topology: (out_ch, kernel_h, stride_h, pad_top, pad_bottom)
FULL_LAYERS = (
    (1024, 512, 4, 254, 254),
    (128, 64, 1, 31, 32),
    (128, 64, 1, 31, 32),
    (128, 64, 1, 31, 32),
    (256, 64, 1, 31, 32),
    (512, 64, 1, 31, 32),
)


@dataclasses.dataclass(frozen=True)
class CrepeConfig:
    layers: tuple = FULL_LAYERS
    in_features: int = 2048  # 512 ch x 4 after poolings


def crepe_frames(audio, hop_length: int):
    """(B, T) 16 kHz audio -> (B, N, 1024) centered frames with torchcrepe's
    pad=True semantics (window//2 zero pad, frame at every hop)."""
    total = audio.shape[-1]
    n_frames = 1 + total // hop_length
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + (
        [(WINDOW_SIZE // 2, WINDOW_SIZE // 2 + hop_length)]
    ))
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(WINDOW_SIZE)[None, :]
    )
    frames = jnp.take(audio, idx, axis=-1)  # (B, N, 1024)
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    std = jnp.maximum(jnp.std(frames, axis=-1, keepdims=True), 1e-10)
    return (frames - mean) / std


def crepe_salience(params, frames, cfg: CrepeConfig = CrepeConfig()):
    """(B*, 1024) normalized frames -> (B*, 360) sigmoid salience."""
    x = frames[:, None, :, None]  # (N, 1, 1024, 1)
    for i, (out_ch, k, stride, pt, pb) in enumerate(cfg.layers):
        x = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (0, 0)))
        p = params["convs"][i]
        x = conv2d(x, p["w"], p["b"], stride=(stride, 1))
        x = jax.nn.relu(x)
        # maxpool (2, 1)
        n, c, h, w = x.shape
        x = x.reshape(n, c, h // 2, 2, w).max(axis=3)
    n = x.shape[0]
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(n, -1)  # torchcrepe permute(0,2,1,3)
    x = x @ params["classifier"]["w"].astype(x.dtype) + params["classifier"]["b"].astype(x.dtype)
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# decoding (host-side numpy)
# ---------------------------------------------------------------------------


def _transition_matrix(width: int = 12) -> np.ndarray:
    i = np.arange(PITCH_BINS)
    t = np.maximum(width - np.abs(i[:, None] - i[None, :]), 0).astype(np.float64)
    return t / t.sum(axis=1, keepdims=True)


def viterbi_path(probs: np.ndarray, width: int = 12) -> np.ndarray:
    """(T, 360) observation probs -> most likely bin path (torchcrepe
    decode.viterbi semantics: uniform prior, triangular transitions)."""
    trans = _transition_matrix(width)
    log_trans = np.log(trans + 1e-20)
    obs = probs / np.maximum(probs.sum(axis=1, keepdims=True), 1e-20)
    log_obs = np.log(obs + 1e-20)
    t_len = probs.shape[0]
    dp = np.full((t_len, PITCH_BINS), -np.inf)
    back = np.zeros((t_len, PITCH_BINS), np.int32)
    dp[0] = np.log(1.0 / PITCH_BINS) + log_obs[0]
    for t in range(1, t_len):
        scores = dp[t - 1][:, None] + log_trans  # (from, to)
        back[t] = np.argmax(scores, axis=0)
        dp[t] = scores[back[t], np.arange(PITCH_BINS)] + log_obs[t]
    path = np.zeros(t_len, np.int32)
    path[-1] = int(np.argmax(dp[-1]))
    for t in range(t_len - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path


def bins_to_f0(path: np.ndarray, salience: np.ndarray) -> np.ndarray:
    """Weighted local average (±4 bins) around the decoded path -> Hz."""
    cents_map = np.pad(bin_cents_table(), (4, 4))
    sal = np.pad(salience, ((0, 0), (4, 4)))
    idx = path[:, None] + np.arange(9)[None, :]
    w = np.take_along_axis(sal, idx, axis=1)
    c = cents_map[idx]
    cents = (w * c).sum(1) / np.maximum(w.sum(1), 1e-12)
    return np.asarray(cents_to_hz(cents))


def crepe_f0_decode(
    salience: np.ndarray,
    *,
    f0_min: float = 50.0,
    f0_max: float = 1100.0,
) -> np.ndarray:
    """(T, 360) salience -> (T,) Hz with fmin/fmax bin masking + viterbi."""
    freqs = np.asarray(cents_to_hz(bin_cents_table()))
    mask = (freqs < f0_min) | (freqs > f0_max)
    probs = salience.astype(np.float64).copy()
    probs[:, mask] = 0.0
    path = viterbi_path(probs)
    return bins_to_f0(path, salience)
