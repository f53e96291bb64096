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
                          n_frames: int, cfg: CrepeConfig = CrepeConfig(),
                          compute_dtype=jnp.float32):
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
    return crepe_salience(params, (frames - mean) / std, cfg,
                          compute_dtype=compute_dtype)


def crepe_salience(params, frames, cfg: CrepeConfig = CrepeConfig(),
                   compute_dtype=jnp.float32):
    """(B*, 1024) normalized frames -> (B*, 360) sigmoid salience.

    torchcrepe's layer order is pad -> conv -> relu -> BatchNorm -> maxpool
    (model.py `layer`, mirroring the original keras CREPE's inline conv
    activation): BN sits AFTER the relu, so it cannot be folded into the
    conv weights — it survives conversion as a per-channel (s, t) affine
    applied post-relu (convert/crepe_ckpt.py). XLA fuses the multiply-add
    into the conv epilogue; pooling commutes with it only for s > 0, so it
    is applied before the pool exactly as the reference orders it.

    compute_dtype=bfloat16 rounds the conv MULTIPLICANDS only (the MXU
    accumulates f32 natively and preferred_element_type keeps the f32
    result; relu/affine/pool/classifier/sigmoid all stay f32) — the same
    policy as the RMVPE U-Net kernels, mirroring the reference's is_half
    fp16 torchcrepe mode (pipeline.py:96-106). Bounded at pipeline
    semantics by tests/test_f0_methods.py."""
    x = frames[:, None, :, None].astype(jnp.float32)  # (N, 1, 1024, 1)
    for i, (out_ch, k, stride, pt, pb) in enumerate(cfg.layers):
        x = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (0, 0)))
        p = params["convs"][i]
        x = conv2d(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                   stride=(stride, 1), preferred_element_type=jnp.float32)
        x = x + p["b"].astype(jnp.float32)[None, :, None, None]
        x = jax.nn.relu(x)
        x = x * p["s"].astype(x.dtype)[:, None, None] + p["t"].astype(x.dtype)[:, None, None]
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


def viterbi_path_device(log_obs, n, width: int = 12):
    """Banded Viterbi as a lax.scan — the decode stays ON DEVICE, so the
    crepe F0 path never fetches the (T, 360) salience to the host (the
    fetch + host recursion were the method's whole gap vs rmvpe/fcpe:
    measured 0.74 s + 0.45 s exposed per 3-min song on the relay).

    Same semantics as viterbi_path (torchcrepe decode.viterbi, reference
    pipeline.py:86-117): triangular transitions, log(p + 1e-20) smoothing,
    out-of-band transitions all score exactly log(1e-20) so their best
    source is the previous row's global argmax ("teleport"), first-index
    argmax tie rules throughout. The DP runs in f32 with per-step
    renormalization (a uniform shift — argmax-invariant) instead of the
    host path's unnormalized f64, so paths can differ only on near-ties
    below f32 resolution (~1e-7 relative; pinned by tests).

    log_obs: (T, 360) f32. n: dynamic valid-frame count — rows t >= n are
    pass-through (dp unchanged, identity backpointer), so the result
    equals a run on log_obs[:n] extended with constant tail.
    """
    t_len, n_bins = log_obs.shape
    if t_len == 0:
        return jnp.zeros((0,), jnp.int32)
    half = width - 1
    bw = 2 * half + 1
    log_trans = np.log(_transition_matrix(width) + 1e-20)
    band = np.full((n_bins, bw), -np.inf, np.float32)
    j = np.arange(n_bins)
    for d in range(-half, half + 1):
        src = j + d
        ok = (src >= 0) & (src < n_bins)
        band[ok, d + half] = log_trans[src[ok], j[ok]]
    band = jnp.asarray(band)
    log_eps = np.float32(np.log(1e-20))
    gidx = jnp.arange(n_bins)[:, None] + jnp.arange(bw)[None, :]  # into dp_pad
    bins = jnp.arange(n_bins, dtype=jnp.int32)

    def step(dp, inp):
        t, obs_t = inp
        m = jnp.argmax(dp)  # first-index tie rule, as the host paths
        eps_cand = dp[m] + log_eps
        dp_pad = jnp.pad(dp, (half, half), constant_values=-jnp.inf)
        cand = dp_pad[gidx] + band  # (bins, bw), d ascending
        bi_d = jnp.argmax(cand, axis=1)  # lowest-d first on ties
        best = jnp.take_along_axis(cand, bi_d[:, None], axis=1)[:, 0]
        bi = (bi_d.astype(jnp.int32) + bins - half)
        # on an exact tie the dense scan keeps the lower source index
        take_eps = (eps_cand > best) | ((eps_cand == best) & (m < bi))
        best = jnp.where(take_eps, eps_cand, best)
        bi = jnp.where(take_eps, m, bi)
        dp_new = best + obs_t
        dp_new = dp_new - jnp.max(dp_new)  # renorm: keeps f32 at full res
        valid = t < n
        dp_out = jnp.where(valid, dp_new, dp)
        back_t = jnp.where(valid, bi, bins).astype(jnp.int16)
        return dp_out, back_t

    dp0 = np.float32(np.log(1.0 / n_bins)) + log_obs[0]
    dp_fin, back = jax.lax.scan(
        step, dp0, (jnp.arange(1, t_len), log_obs[1:])
    )
    end = jnp.argmax(dp_fin).astype(jnp.int32)

    def bt_step(bin_, back_t):
        b = back_t[bin_].astype(jnp.int32)
        return b, b

    _, path_head = jax.lax.scan(bt_step, end, back, reverse=True)
    return jnp.concatenate([path_head, end[None]])


def crepe_f0_decode_device(salience, n, *, f0_min: float = 50.0,
                           f0_max: float = 1100.0, use_pallas: bool = False):
    """Device mirror of crepe_f0_decode: (T, 360) salience -> (T,) Hz with
    fmin/fmax bin masking, scan Viterbi, ±4-bin weighted cents. f32 per the
    repo numerics rule (F0 cents decode stays fp32); rows t >= n are
    garbage the caller's resize never reads.

    use_pallas routes the recursion through ops/pallas_viterbi.py (TPU
    only): the lax.scan lowering pays ~80 us of per-op dispatch per
    timestep (1.86 s per 3-min song, measured); the kernel runs the same
    bit-exact recursion inside one fori_loop."""
    freqs = np.asarray(cents_to_hz(bin_cents_table()), np.float64)
    bin_mask = (freqs < f0_min) | (freqs > f0_max)
    sal = salience.astype(jnp.float32)
    probs = jnp.where(jnp.asarray(bin_mask)[None, :], 0.0, sal)
    obs = probs / jnp.maximum(probs.sum(axis=1, keepdims=True), 1e-20)
    log_obs = jnp.log(obs + 1e-20)
    if use_pallas:
        from ..ops.pallas_viterbi import viterbi_path_pallas

        path = viterbi_path_pallas(log_obs, n)
    else:
        path = viterbi_path_device(log_obs, n)
    # bins_to_f0 on device: weighted local average around the path
    cents_map = jnp.pad(jnp.asarray(bin_cents_table()), (4, 4))
    sal_pad = jnp.pad(sal, ((0, 0), (4, 4)))
    idx = path[:, None] + jnp.arange(9)[None, :]
    w = jnp.take_along_axis(sal_pad, idx, axis=1)
    c = cents_map[idx]
    cents = (w * c).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1e-12)
    return 10.0 * (2.0 ** (cents / 1200.0))


def crepe_resize_device(f0, n, p_len, out_size: int):
    """Device mirror of the reference crepe post (pipeline.py:108-117,
    mirrored host-side in pipeline/crepe_method.py): sub-threshold frames
    -> nan, linear resize from n frames to p_len via
    np.interp(i*n/p_len, arange(n), source), nan -> 0. Static out_size
    (>= p_len); n and p_len travel as dynamic scalars.

    The source grid index i*n//p_len is computed EXACTLY without int64:
    a f32 estimate q0, then the residual i*n - q0*p_len in wrap-exact
    int32 (the true residual is a few multiples of p_len, far below 2^31
    even where i*n itself would overflow)."""
    i = jnp.arange(out_size, dtype=jnp.int32)
    nf = jnp.maximum(n, 1).astype(jnp.int32)
    pf = jnp.maximum(p_len, 1).astype(jnp.int32)
    q0 = jnp.floor(
        i.astype(jnp.float32) * (nf.astype(jnp.float32) / pf.astype(jnp.float32))
    ).astype(jnp.int32)
    r = i * nf - q0 * pf
    q = q0 + jnp.floor_divide(r, pf)
    r = r - jnp.floor_divide(r, pf) * pf
    frac = r.astype(jnp.float32) / pf.astype(jnp.float32)
    s0 = f0[jnp.clip(q, 0, nf - 1)]
    s1 = f0[jnp.clip(q + 1, 0, nf - 1)]
    out = jnp.where(frac > 0, s0 + frac * (s1 - s0), s0)
    out = jnp.where(q >= nf - 1, f0[nf - 1], out)  # np.interp right clamp
    # nan gate: an exact grid hit (frac == 0) reads only s0 — np.interp
    # returns fp[k] there without touching the nan neighbor (verified)
    invalid = (s0 < 0.001) | ((s1 < 0.001) & (frac > 0) & (q < nf - 1))
    out = jnp.where(invalid, 0.0, out)
    return jnp.where(i < p_len, out, 0.0)


def bins_to_f0(path: np.ndarray, salience: np.ndarray) -> np.ndarray:
    """Weighted local average (±4 bins) around the decoded path -> Hz.

    Salience may arrive float16 (the wire format of the device slabs) but
    the cents average runs in float32+: an f16 `w.sum` loses ~5e-4 relative
    on the denominator, which the repo numerics rule (F0 cents decode stays
    fp32) forbids."""
    cents_map = np.pad(bin_cents_table(), (4, 4))
    sal = np.pad(salience.astype(np.float32), ((0, 0), (4, 4)))
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
