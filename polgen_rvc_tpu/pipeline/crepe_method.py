""""mangio-crepe" F0 method glue (reference VC.get_f0_crepe,
pipeline.py:86-117): CREPE-full salience at the user hop_length, Viterbi
decode, nan-gate + length interpolation. (The reference's 0.999-quantile
pre-scaling cancels under CREPE's per-frame normalization — see
crepe_salience_window.)"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.crepe import crepe_f0_decode

# Per-dispatch frame batch. CREPE's first conv expands every 1024-sample
# frame to (1024 ch x 256 h) ~ 0.5 MB of bf16 temp PER FRAME, so a whole
# 3-min song (~18k frames) in one graph needs ~17 GB HBM — over the v5e's
# 16 GB (measured OOM). A fixed 2048-frame batch keeps the peak temp at
# ~1 GB, compiles ONE graph regardless of song length, and the batches
# dispatch asynchronously so device work stays back-to-back.
_FRAME_BUCKET = 2048


def crepe_f0(vc, audio: np.ndarray, p_len: int, opts, uploaded=None) -> np.ndarray:
    if vc.crepe_params is None:
        raise RuntimeError(
            "crepe weights not loaded (assets/predictors/crepe_full.pth)"
        )
    hop = int(opts.hop_length)
    # framing + salience read the pipeline's shared int16 upload in-graph:
    # nothing larger than the (2048, 360) salience slabs crosses the link
    audio_dev, inv_scale, t = uploaded or vc._upload_audio(audio)
    n = t // hop + 1
    padded = int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET

    fn = vc._crepe_fn(int(audio_dev.shape[1]))
    # dispatch every batch before fetching any: JAX dispatch is async, so
    # the device pipelines batch k+1's compute under batch k's D2H copy
    outs = [
        fn(vc.crepe_params, audio_dev, inv_scale, jnp.int32(start),
           jnp.int32(hop))
        for start in range(0, padded, _FRAME_BUCKET)
    ]
    vc._start_host_copy(*outs)
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
