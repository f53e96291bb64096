"""FCPE F0 predictor (conformer + Performer linear attention) in pure JAX.

Capability parity with the reference FCPE stack (/root/reference/rvc/lib/
predictors/FCPE.py): input conv stack with GroupNorm, 12 PCmer layers
(Performer FastAttention with the checkpoint's stored orthogonal projection
buffer + depthwise-GLU conformer conv module), LayerNorm, weight-normed
dense to 360 cent bins, sigmoid, local-argmax cents decode, and the
predictor's nearest-resize + nonzero-interp post-processing.

Unlike the reference, the model is built once and cached (the reference
constructs and destroys it per call — pipeline.py:169-181).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.audio import log_mel_spectrogram, mel_filterbank
from ..ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class FcpeConfig:
    input_channel: int = 128
    out_dims: int = 360
    n_layers: int = 12
    n_chans: int = 512
    n_heads: int = 8
    f0_min: float = 32.70
    f0_max: float = 1975.5
    # mel frontend
    sampling_rate: int = 16000
    num_mels: int = 128
    n_fft: int = 1024
    win_size: int = 1024
    hop_size: int = 160
    fmin: float = 0.0
    fmax: float = 8000.0

    def cent_table(self) -> np.ndarray:
        lo = 1200.0 * math.log2(self.f0_min / 10.0)
        hi = 1200.0 * math.log2(self.f0_max / 10.0)
        return np.linspace(lo, hi, self.out_dims, dtype=np.float32)


@lru_cache(maxsize=4)
def _fcpe_mel_basis(sr, n_fft, n_mels, fmin, fmax):
    return mel_filterbank(
        sr=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax, htk=False
    )


def fcpe_mel(audio, cfg: FcpeConfig):
    """(B, T) -> (B, n_frames, mels); reference Wav2Mel (FCPE.py:96-164, 764-783)."""
    t = audio.shape[-1]
    pad_left = (cfg.win_size - cfg.hop_size) // 2
    pad_right = max((cfg.win_size - cfg.hop_size + 1) // 2,
                    cfg.win_size - t - pad_left)
    mode = "reflect" if pad_right < t else "constant"
    basis = _fcpe_mel_basis(cfg.sampling_rate, cfg.n_fft, cfg.num_mels,
                            cfg.fmin, cfg.fmax)
    mel = log_mel_spectrogram(
        audio, basis, n_fft=cfg.n_fft, hop_length=cfg.hop_size,
        win_length=cfg.win_size, center=False,
        pad_left=pad_left, pad_right=pad_right, pad_mode=mode,
        clamp=1e-5, magnitude_eps=1e-9,
    )  # (B, mels, N)
    mel = mel.swapaxes(1, 2)
    n_frames = t // cfg.hop_size + 1
    if n_frames > mel.shape[1]:
        mel = jnp.concatenate([mel, mel[:, -1:]], axis=1)
    return mel[:, :n_frames]


def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"].astype(x.dtype) + p["beta"].astype(x.dtype)


def _group_norm_channels(x, gamma, beta, groups, eps=1e-5, nmask=None,
                         n_valid=None):
    """GroupNorm on (B, C, T). With nmask/n_valid, the statistics run over
    the first n_valid frames only (the reference normalizes an unpadded
    (B, C, n) tensor; frames beyond n_valid are bucket padding here and
    must not pollute mean/var)."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t)
    if nmask is None:
        mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
        var = jnp.var(xg, axis=(2, 3), keepdims=True)
    else:
        m = nmask.astype(x.dtype)[None, None, None, :]
        cnt = (c // groups) * jnp.maximum(n_valid, 1).astype(x.dtype)
        mean = jnp.sum(xg * m, axis=(2, 3), keepdims=True) / cnt
        xc = (xg - mean) * m
        var = jnp.sum(xc * xc, axis=(2, 3), keepdims=True) / cnt
    x = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    return x * gamma.astype(x.dtype)[None, :, None] + beta.astype(x.dtype)[None, :, None]


def _softmax_kernel(data, projection, *, is_query: bool, eps: float = 1e-4):
    """Performer FAVOR+ feature map, exactly mirroring FCPE.py:170-197
    (including the reference's eps-inside-exp quirk on the key branch)."""
    d = data.shape[-1]
    normalizer = d ** -0.25
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum("bhnd,jd->bhnj", normalizer * data, projection)
    diag = jnp.sum(data**2, axis=-1, keepdims=True) / 2.0 * (normalizer**2)
    if is_query:
        out = ratio * (
            jnp.exp(data_dash - diag - jnp.max(data_dash, axis=-1, keepdims=True))
            + eps
        )
    else:
        out = ratio * jnp.exp(data_dash - diag + eps)
    return out


def _linear_attention(q, k, v):
    """FCPE.py:339-348 non-causal linear attention."""
    k_cumsum = k.sum(axis=-2)
    d_inv = 1.0 / (jnp.einsum("bhnd,bhd->bhn", q, k_cumsum) + 1e-8)
    context = jnp.einsum("bhnd,bhne->bhde", k, v)
    return jnp.einsum("bhde,bhnd,bhn->bhne", context, q, d_inv)


def _self_attention(x, p, n_heads: int, nmask=None):
    b, n, c = x.shape
    # reference SelfAttention uses a FIXED dim_head=64 (inner = 512) no
    # matter the model width (FCPE.py:443-465) — infer inner from the
    # projection weights rather than assuming c / heads
    inner = p["to_q"]["w"].shape[1]
    dh = inner // n_heads

    def proj(name):
        y = x @ p[name]["w"].astype(x.dtype) + p[name]["b"].astype(x.dtype)
        return y.reshape(b, n, n_heads, dh).swapaxes(1, 2)  # (B, H, N, dh)

    q, k, v = proj("to_q"), proj("to_k"), proj("to_v")
    proj_mat = p["projection_matrix"].astype(x.dtype)
    q = _softmax_kernel(q, proj_mat, is_query=True)
    k = _softmax_kernel(k, proj_mat, is_query=False)
    if nmask is not None:
        # the FAVOR+ sums run over every frame; zero the bucket-padding
        # frames' key features and values so they contribute exact 0s
        # (the feature map's +eps makes them nonzero otherwise)
        m = nmask.astype(k.dtype)[None, None, :, None]
        k = k * m
        v = v * m
    out = _linear_attention(q, k, v)
    out = out.swapaxes(1, 2).reshape(b, n, inner)
    return out @ p["to_out"]["w"].astype(x.dtype) + p["to_out"]["b"].astype(x.dtype)


def _conformer_conv(x, p, nmask=None):
    """ConformerConvModule (FCPE.py:312-336): LN -> 1x1 conv -> GLU ->
    depthwise k31 -> swish -> 1x1 conv."""
    y = _layer_norm(x, p["norm"])
    y = y.swapaxes(1, 2)  # (B, C, N)
    y = conv1d(y, p["conv_in"]["w"], p["conv_in"]["b"])
    a, g = jnp.split(y, 2, axis=1)
    y = a * jax.nn.sigmoid(g)
    if nmask is not None:
        # the depthwise k31 window crosses the n_valid boundary; the
        # reference sees zero 'same' padding there, not bucket-pad junk
        y = y * nmask.astype(y.dtype)[None, None, :]
    y = conv1d(y, p["depthwise"]["w"], p["depthwise"]["b"],
               padding=15, groups=y.shape[1])
    y = y * jax.nn.sigmoid(y)  # swish
    y = conv1d(y, p["conv_out"]["w"], p["conv_out"]["b"])
    return y.swapaxes(1, 2)


def fcpe_salience(params, cfg: FcpeConfig, mel, n_valid=None):
    """(B, N, mels) -> (B, N, 360) sigmoid salience (FCPE.forward, infer).

    With n_valid (scalar, frames of real signal), every frame-global op —
    GroupNorm statistics, the FAVOR+ attention sums, and each conv's
    receptive field at the boundary — behaves exactly as if the input were
    the unpadded (B, n_valid, mels) tensor the reference processes: frames
    [0, n_valid) match a true-length run to float rounding, however much
    bucket padding follows. Frames beyond n_valid are garbage (callers
    slice or resize them away)."""
    nmask = None
    if n_valid is not None:
        nmask = jnp.arange(mel.shape[1]) < n_valid
        mel = jnp.where(nmask[None, :, None], mel, 0.0)
    x = mel.swapaxes(1, 2)
    st = params["stack"]
    x = conv1d(x, st["conv1"]["w"], st["conv1"]["b"], padding=1)
    x = _group_norm_channels(x, st["gn"]["gamma"], st["gn"]["beta"], groups=4,
                             nmask=nmask, n_valid=n_valid)
    x = jax.nn.leaky_relu(x, 0.01)
    if nmask is not None:
        # GN shifts the padded frames off zero; conv2's k=3 window at the
        # boundary must read the reference's zero 'same' padding
        x = x * nmask.astype(x.dtype)[None, None, :]
    x = conv1d(x, st["conv2"]["w"], st["conv2"]["b"], padding=1)
    x = x.swapaxes(1, 2)  # (B, N, C)

    for lp in params["layers"]:
        x = x + _self_attention(_layer_norm(x, lp["norm"]), lp["attn"],
                                cfg.n_heads, nmask)
        x = x + _conformer_conv(x, lp["conformer"], nmask)

    x = _layer_norm(x, params["norm"])
    x = x @ params["dense_out"]["w"].astype(x.dtype) + params["dense_out"]["b"].astype(x.dtype)
    return jax.nn.sigmoid(x)


def fcpe_decode(salience, cfg: FcpeConfig, threshold: float = 0.03):
    """cents_local_decoder (FCPE.py:672-687) -> Hz, 0 where unconfident."""
    cent_table = jnp.asarray(cfg.cent_table())
    confident = jnp.max(salience, axis=-1)
    max_idx = jnp.argmax(salience, axis=-1)
    idx = jnp.clip(
        max_idx[..., None] + jnp.arange(-4, 5)[None, :], 0, cfg.out_dims - 1
    )
    sal = jnp.take_along_axis(salience, idx, axis=-1)
    cents = jnp.sum(cent_table[idx] * sal, axis=-1) / jnp.maximum(
        jnp.sum(sal, axis=-1), 1e-12
    )
    f0 = 10.0 * (2.0 ** (cents / 1200.0))
    return jnp.where(confident > threshold, f0, 0.0)


def fcpe_resize_fill(f0, n, p_len):
    """Device mirror of fcpe_post_process for the fused F0 graph: nearest-
    resize from n frames to p_len, then linear interpolation across
    unvoiced (zero) gaps with edge hold — all static-shaped, so the graph
    key is independent of song length (n/p_len travel as scalars).

    The nearest-resize index uses exact integer floor((i*n)/p_len); the
    host/reference formulation truncates i*(n/p_len) in float, which can
    pick the neighbouring frame when i*(n/p_len) rounds across an integer.
    With hop == window the resize is near-identity, so the tracks agree
    except at isolated boundary frames (pinned by tests/test_f0_methods).

    floor((i*n)/p_len) is computed WITHOUT int64 (disabled by default) and
    without int32 overflow, the same way as crepe_resize_device: a f32
    quotient estimate q0, then the residual i*n - q0*p_len in wrap-exact
    int32 arithmetic (the true residual is a few multiples of p_len, far
    below 2^31 even where i*n itself wraps — a naive (i*n)//p_len silently
    corrupts frames past i*n >= 2^31, ~46k frames at hop 160)."""
    size = f0.shape[0]
    i = jnp.arange(size, dtype=jnp.int32)
    nf = jnp.maximum(n, 1).astype(jnp.int32)
    pf = jnp.maximum(p_len, 1).astype(jnp.int32)
    q0 = jnp.floor(
        i.astype(jnp.float32) * (nf.astype(jnp.float32) / pf.astype(jnp.float32))
    ).astype(jnp.int32)
    r = i * nf - q0 * pf
    src = jnp.clip(q0 + jnp.floor_divide(r, pf), 0, nf - 1)
    f0r = f0[src]
    valid = (i < p_len) & (f0r > 0)
    prev = jax.lax.cummax(jnp.where(valid, i, -1))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(valid, i, size))))
    vprev = f0r[jnp.clip(prev, 0, size - 1)]
    vnext = f0r[jnp.clip(nxt, 0, size - 1)]
    w = (i - prev).astype(jnp.float32) / jnp.maximum(nxt - prev, 1).astype(
        jnp.float32
    )
    out = vprev + (vnext - vprev) * w
    out = jnp.where(prev < 0, vnext, jnp.where(nxt >= size, vprev, out))
    out = jnp.where(jnp.any(valid), out, 0.0)
    return jnp.where(i < p_len, out, 0.0)


def fcpe_post_process(f0: np.ndarray, p_len: int, hop: int, sr: int) -> np.ndarray:
    """Predictor post (FCPE.py:845-870): nearest-resize to p_len, then fill
    unvoiced gaps by interpolating between nonzero samples."""
    n = len(f0)
    if n != p_len:  # nearest interpolation
        idx = np.clip((np.arange(p_len) * (n / p_len)).astype(np.int64), 0, n - 1)
        f0 = f0[idx]
    nz = np.nonzero(f0)[0]
    if nz.size == 0:
        return np.zeros(p_len, np.float32)
    if nz.size == 1:
        return np.full(p_len, f0[nz[0]], np.float32)
    time_org = hop / sr * nz
    time_frame = np.arange(p_len) * hop / sr
    out = np.interp(time_frame, time_org, f0[nz], left=f0[nz[0]], right=f0[nz[-1]])
    return out.astype(np.float32)
