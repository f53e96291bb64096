"""CREPE F0 model (torchcrepe "full" capacity) as pure JAX functions.

Replaces the torchcrepe dependency (reference pipeline.py:86-117,
"mangio-crepe" method): six conv blocks over 1024-sample frames with
per-frame normalization, sigmoid over 360 pitch bins, then Viterbi decoding
with a triangular transition and local weighted-average cents.

Batch-norm is folded at conversion; frames batch over the MXU (the frame
batch is the only large dim). Viterbi runs host-side, banded in C++
(native/viterbi.cpp, O(T*360*(2*width-1)), bit-identical to the dense
reference formulation kept as viterbi_path_dense).
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


def crepe_salience_window(params, audio_i16, inv_scale, start_frame, hop,
                          n_frames: int, cfg: CrepeConfig = CrepeConfig()):
    """Salience for frames [start_frame, start_frame + n_frames) computed
    straight from the pipeline's shared (1, S) int16 audio upload: framing
    (torchcrepe pad=True geometry — window//2 zero pad, frame at every
    hop), per-frame normalization, and the conv stack in ONE graph, so no
    (N, 1024) frame tensor ever crosses the host link (74 MB/3-min song).
    start_frame and hop are dynamic scalars: one compiled graph per audio
    bucket covers every batch, song length, and hop setting.

    The reference's 0.999-quantile pre-scaling (pipeline.py:94-97) cancels
    exactly under the per-frame mean/std normalization and is skipped."""
    x = audio_i16[0].astype(jnp.float32) * inv_scale
    pos = (
        (start_frame + jnp.arange(n_frames))[:, None] * hop
        - WINDOW_SIZE // 2
        + jnp.arange(WINDOW_SIZE)[None, :]
    )
    frames = jnp.take(x, pos, mode="fill", fill_value=0.0)  # (n, 1024)
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    std = jnp.maximum(jnp.std(frames, axis=-1, keepdims=True), 1e-10)
    return crepe_salience(params, (frames - mean) / std, cfg)


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


def _viterbi_prep(probs: np.ndarray, width: int):
    trans = _transition_matrix(width)
    log_trans = np.log(trans + 1e-20)
    obs = probs / np.maximum(probs.sum(axis=1, keepdims=True), 1e-20)
    log_obs = np.log(obs + 1e-20)
    return log_trans, log_obs


def viterbi_path_dense(probs: np.ndarray, width: int = 12) -> np.ndarray:
    """Reference formulation: full (from, to) scores each step. O(T*360^2)
    host numpy — ~12 s for a 3-minute song; kept as the no-toolchain
    fallback and as the oracle the banded C++ path is tested against."""
    log_trans, log_obs = _viterbi_prep(probs, width)
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


def viterbi_path(probs: np.ndarray, width: int = 12) -> np.ndarray:
    """(T, 360) observation probs -> most likely bin path (torchcrepe
    decode.viterbi semantics: uniform prior, triangular transitions).

    The triangular transition matrix is zero outside |from-to| < width and
    the 1e-20 smoothing makes every out-of-band transition score exactly
    log(1e-20), so the recursion runs banded in C++ (native/viterbi.cpp,
    bit-identical to the dense formulation, ~60x faster) with the dense
    numpy path as fallback."""
    t_len = probs.shape[0]
    if t_len == 0:
        return np.zeros(0, np.int32)
    try:
        from ..native import viterbi_library

        lib = viterbi_library()
    except Exception:
        return viterbi_path_dense(probs, width)

    import ctypes

    half = width - 1  # strictly-positive transitions: |from-to| <= width-1
    bw = 2 * half + 1
    log_trans = np.log(_transition_matrix(width) + 1e-20)
    band = np.full((PITCH_BINS, bw), -np.inf)
    j = np.arange(PITCH_BINS)
    for d in range(-half, half + 1):
        src = j + d
        ok = (src >= 0) & (src < PITCH_BINS)
        band[ok, d + half] = log_trans[src[ok], j[ok]]
    band = np.ascontiguousarray(band, np.float64)
    path = np.zeros(t_len, np.int32)
    common = (
        ctypes.c_int64(t_len), ctypes.c_int32(PITCH_BINS),
        band.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(half),
        ctypes.c_double(float(np.log(1e-20))),
        ctypes.c_double(float(np.log(1.0 / PITCH_BINS))),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    p32 = np.ascontiguousarray(probs, np.float32)
    if np.array_equal(p32.astype(np.float64), np.asarray(probs, np.float64)):
        # float32-exact input (the production case: salience IS float32):
        # normalize + log run inline in C++, skipping the (T, 360) float64
        # log-obs materialization (~0.3 s/3-min song of host numpy)
        lib.polgen_viterbi_banded_probs(
            p32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *common
        )
    else:
        _, log_obs = _viterbi_prep(probs, width)
        log_obs = np.ascontiguousarray(log_obs, np.float64)
        lib.polgen_viterbi_banded(
            log_obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), *common
        )
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
