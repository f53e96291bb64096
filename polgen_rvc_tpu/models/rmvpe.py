"""RMVPE neural F0 predictor as pure JAX functions.

Capability parity with the reference E2E net (/root/reference/rvc/lib/
predictors/RMVPE.py:140-376): DeepUnet (5 encoder / 4 intermediate / 5
decoder stages of ConvBlockRes with 2x2 avg-pooling), 3-channel head conv,
BiGRU(384 -> 2x256) + Linear(512 -> 360) + sigmoid salience, and the
mel frontend (128 HTK mels, win 1024, hop 160, fmin 30, fmax 8000,
log-clamp 1e-5, RMVPE.py:449-451).

All BatchNorms are inference-folded into their preceding convs at conversion
time (convert/rmvpe_ckpt.py), so the runtime graph is conv/relu/pool only —
XLA fuses it cleanly. The frame axis is padded to a multiple of 32 by the
caller (mel2hidden parity, RMVPE.py:465-466) — with fixed-shape chunks this
is a static pad, never a recompile.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, conv_transpose2d
from ..ops.audio import log_mel_spectrogram, mel_filterbank
from ..ops.rnn import bigru
from ..ops.f0_utils import salience_to_f0

N_MELS = 128
SAMPLE_RATE = 16000
WIN_LENGTH = 1024
HOP_LENGTH = 160
MEL_FMIN = 30
MEL_FMAX = 8000
N_ENC_LAYERS = 5
N_INTER_LAYERS = 4
N_BLOCKS = 4


@lru_cache(maxsize=1)
def _mel_basis():
    return mel_filterbank(
        sr=SAMPLE_RATE, n_fft=WIN_LENGTH, n_mels=N_MELS,
        fmin=MEL_FMIN, fmax=MEL_FMAX, htk=True,
    )


def rmvpe_mel(audio):
    """(B, T_samples) -> (B, 128, T_frames) log-mel (RMVPE.py:412-439)."""
    return log_mel_spectrogram(
        audio, _mel_basis(), n_fft=WIN_LENGTH, hop_length=HOP_LENGTH,
        center=True, clamp=1e-5,
    )


def _conv_block_res(x, p):
    """ConvBlockRes with folded BN (RMVPE.py:140-175)."""
    y = conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    y = jax.nn.relu(y)
    y = conv2d(y, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    y = jax.nn.relu(y)
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return y + x


def _block_chain(x, blocks, use_pallas: bool = False):
    """Run a ConvBlockRes chain.

    On TPU the C<=128 levels run the W-folded fused kernel
    (ops/pallas_unet2d.py): folding mel columns into channels presents a
    full M=128 / K-multiple-of-128 GEMM to the MXU, where XLA's conv
    lowering leaves most of the array idle at C=16..64. (The round-1
    unfolded kernel measured slower than XLA — the fold is what pays.)"""
    c_out = int(blocks[0]["conv1"]["w"].shape[0])
    c_in = int(blocks[0]["conv1"]["w"].shape[1])
    w = int(x.shape[3])
    if use_pallas and x.shape[0] == 1 and c_out <= 128:
        fold = max(128 // c_out, 1)
        if w % fold == 0:
            from ..ops.pallas_unet2d import fused_convblock_chain_folded

            # bf16 weights/im2col = XLA's default TPU conv precision (both
            # round multiplicands to bf16, accumulate fp32); tiles sized so
            # tile + 2*halo is an exact lane multiple (halo = 2 per block)
            halo = 2 * len(blocks)
            tile = 512 - 2 * halo  # tile + 2*halo = exact lane multiple
            return fused_convblock_chain_folded(
                x, blocks, fold=fold, time_tile=tile,
                compute_dtype=jnp.bfloat16,
            )
    for blk in blocks:
        x = _conv_block_res(x, blk)
    return x


def _avg_pool_2x2(x):
    b, c, h, w = x.shape
    return x.reshape(b, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


def rmvpe_salience(params, mel, *, compute_dtype=jnp.float32,
                   use_pallas: bool = False):
    """(B, 128, T) log-mel -> (B, T, 360) sigmoid salience (E2E.forward).

    T must be a multiple of 32 (five 2x poolings); callers pad reflect.
    compute_dtype=bfloat16 mirrors the reference's is_half fp16 mode
    (RMVPE.py:456-457); the GRU/head stay fp32.
    """
    x = mel.astype(compute_dtype).swapaxes(1, 2)[:, None]  # (B, 1, T, 128)
    # input BatchNorm (Encoder.bn) folded to an affine transform
    inb = params["in_bn"]
    x = x * inb["scale"].astype(x.dtype) + inb["shift"].astype(x.dtype)

    skips = []
    for enc in params["encoder"]:
        x = _block_chain(x, enc["blocks"], use_pallas)
        skips.append(x)
        x = _avg_pool_2x2(x)

    for inter in params["intermediate"]:
        x = _block_chain(x, inter["blocks"], use_pallas)

    for dec, skip in zip(params["decoder"], reversed(skips)):
        up = dec["up"]
        x = conv_transpose2d(
            x, up["w"], up["b"], stride=(2, 2), padding=(1, 1), output_padding=(1, 1)
        )
        x = jax.nn.relu(x)
        x = jnp.concatenate([x, skip], axis=1)
        x = _block_chain(x, dec["blocks"], use_pallas)

    x = conv2d(x, params["cnn"]["w"], params["cnn"]["b"], padding=1)  # (B,3,T,128)
    b, c, t, m = x.shape
    x = x.astype(jnp.float32).swapaxes(1, 2).reshape(b, t, c * m)  # (B, T, 384)

    x = bigru(x, params["gru"])  # (B, T, 512)
    x = x @ params["fc"]["w"].astype(x.dtype) + params["fc"]["b"].astype(x.dtype)
    return jax.nn.sigmoid(x)


def pad_frames_to_32(mel):
    """Reflect-pad the frame axis to a multiple of 32 (RMVPE.py:465-466)."""
    n = mel.shape[-1]
    pad = min(32 * ((n - 1) // 32 + 1) - n, n)
    if pad:
        mel = jnp.pad(mel, [(0, 0)] * (mel.ndim - 1) + [(0, pad)], mode="reflect")
    return mel, n


def rmvpe_f0(
    params,
    audio,
    *,
    threshold: float = 0.03,
    f0_min: float | None = None,
    f0_max: float | None = None,
    compute_dtype=jnp.float32,
):
    """Audio (B, T_samples) @16 kHz -> F0 (B, T_frames) Hz.

    With f0_min/f0_max set this is the "rmvpe+" method
    (infer_from_audio_with_pitch, RMVPE.py:487-496).
    """
    mel = rmvpe_mel(audio.astype(compute_dtype))
    mel, n = pad_frames_to_32(mel)
    salience = rmvpe_salience(params, mel)[:, :n]
    return salience_to_f0(
        salience.astype(jnp.float32), threshold, f0_min, f0_max
    )
