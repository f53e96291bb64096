""""fcpe" F0 method glue (reference pipeline.py:169-181 +
FCPEF0Predictor.compute_f0, FCPE.py:872-880)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.fcpe import fcpe_decode, fcpe_mel, fcpe_post_process, fcpe_salience

_FRAME_BUCKET = 1024


def fcpe_f0(vc, audio: np.ndarray, p_len: int, opts) -> np.ndarray:
    if vc.fcpe_params is None or vc.fcpe_cfg is None:
        raise RuntimeError("fcpe weights not loaded (assets/predictors/fcpe.pt)")
    cfg = vc.fcpe_cfg
    mel = fcpe_mel(jnp.asarray(audio, jnp.float32)[None], cfg)
    n = mel.shape[1]
    bucket = int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET
    mel = jnp.pad(mel, ((0, 0), (0, bucket - n), (0, 0)))

    if bucket not in vc._fcpe_fns:
        @jax.jit
        def fn(params, m, n_valid, threshold):
            # n_valid keeps the frame-global ops (GroupNorm stats, FAVOR+
            # sums) blind to the bucket padding: frames [0, n) equal a
            # true-length (reference) run regardless of bucket size
            sal = fcpe_salience(params, cfg, m, n_valid=n_valid)
            return fcpe_decode(sal, cfg, threshold)

        vc._fcpe_fns[bucket] = fn
    f0 = np.array(
        vc._fcpe_fns[bucket](vc.fcpe_params, mel, jnp.int32(n), 0.03)[0, :n]
    )

    if not np.any(f0 > 0):
        return np.zeros(p_len, np.float32)
    return fcpe_post_process(f0, p_len, cfg.hop_size, cfg.sampling_rate)
