""""mangio-crepe" F0 method glue (reference VC.get_f0_crepe,
pipeline.py:86-117): quantile-normalize, CREPE-full salience at the user
hop_length, Viterbi decode, nan-gate + length interpolation."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.crepe import crepe_f0_decode, crepe_frames, crepe_salience

# Per-dispatch frame batch. CREPE's first conv expands every 1024-sample
# frame to (1024 ch x 256 h) ~ 0.5 MB of bf16 temp PER FRAME, so a whole
# 3-min song (~18k frames) in one graph needs ~17 GB HBM — over the v5e's
# 16 GB (measured OOM). A fixed 2048-frame batch keeps the peak temp at
# ~1 GB, compiles ONE graph regardless of song length, and the batches
# dispatch asynchronously so device work stays back-to-back.
_FRAME_BUCKET = 2048


def crepe_f0(vc, audio: np.ndarray, p_len: int, opts) -> np.ndarray:
    if vc.crepe_params is None:
        raise RuntimeError(
            "crepe weights not loaded (assets/predictors/crepe_full.pth)"
        )
    x = audio.astype(np.float32)
    denom = np.quantile(np.abs(x), 0.999)
    if denom > 0:
        x = x / denom
    hop = int(opts.hop_length)

    frames = np.asarray(crepe_frames(jnp.asarray(x)[None], hop))[0]  # (N, 1024)
    n = frames.shape[0]
    padded = int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET
    frames = np.pad(frames, ((0, padded - n), (0, 0)))

    fn = vc._crepe_fn(_FRAME_BUCKET)
    # dispatch every batch before fetching any: JAX dispatch is async, so
    # the device pipelines batch k+1's compute under batch k's D2H copy
    outs = [
        fn(vc.crepe_params, jnp.asarray(frames[i : i + _FRAME_BUCKET]))
        for i in range(0, padded, _FRAME_BUCKET)
    ]
    salience = np.concatenate([np.asarray(o) for o in outs])[:n]

    f0 = crepe_f0_decode(salience, f0_min=opts.f0_min, f0_max=opts.f0_max)

    # reference post (pipeline.py:108-117): sub-threshold -> nan, resample
    # the f0 track to p_len, nan -> 0
    source = f0.astype(np.float64)
    source[source < 0.001] = np.nan
    target = np.interp(
        np.arange(0, len(source) * p_len, len(source)) / p_len,
        np.arange(0, len(source)),
        source,
    )
    return np.nan_to_num(target).astype(np.float32)
