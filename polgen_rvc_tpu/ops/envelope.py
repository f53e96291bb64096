"""RMS envelope measurement and transfer (the `volume_envelope` knob).

Reproduces AudioProcessor.change_rms (/root/reference/rvc/infer/
pipeline.py:29-61): librosa-style centered RMS with frame=sr//2*2,
hop=sr//2, linear-resized to the target length, then
target * rms_src^(1-rate) * rms_tgt^(rate-1).
"""

from __future__ import annotations

import jax.numpy as jnp

from .interpolate import interpolate_linear


def rms_envelope(x, frame_length: int, hop_length: int):
    """Centered RMS per frame, matching librosa.feature.rms defaults.

    x: (..., T) -> (..., 1 + T//hop) with frame centers at k*hop.
    """
    pad = frame_length // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="constant")
    t = x.shape[-1]
    n_frames = 1 + t // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    frames = jnp.take(xp, idx, axis=-1)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1))


def transfer_rms(source, source_sr: int, target, target_sr: int, rate):
    """Mix source/target loudness contours; rate=1 keeps target unchanged.

    source: (Ts,) at source_sr; target: (Tt,) at target_sr. Returns adjusted
    target. rate in [0, 1]: 0 = fully follow the source envelope.
    """
    rms1 = rms_envelope(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = rms_envelope(target, target_sr // 2 * 2, target_sr // 2)
    n = target.shape[-1]
    rms1 = interpolate_linear(rms1[None, None], n)[0, 0]
    rms2 = interpolate_linear(rms2[None, None], n)[0, 0]
    rms2 = jnp.maximum(rms2, 1e-6)
    gain = jnp.power(rms1, 1.0 - rate) * jnp.power(rms2, rate - 1.0)
    return target * gain
