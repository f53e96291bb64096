"""torch.nn.functional.interpolate semantics for 1-D signals.

The reference pipeline leans on three interpolation flavours:
  - nearest x2 feature upsample (50 Hz -> 100 Hz frames)
  - nearest upsample by integer factor inside SineGen
  - linear resize (align_corners False) for RMS envelopes, and
    linear align_corners=True inside SineGen
All are reproduced here as gather-based jittable functions on the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest(x, factor: int):
    """Nearest-neighbour upsample by an integer factor along the last axis.

    Equivalent to F.interpolate(x, scale_factor=factor, mode="nearest") for
    integer factors: each sample is repeated ``factor`` times.
    """
    return jnp.repeat(x, factor, axis=-1)


def interpolate_nearest(x, size: int):
    """F.interpolate(x, size=size, mode="nearest") along the last axis."""
    in_size = x.shape[-1]
    # torch nearest: src = floor(dst * in/out)
    idx = jnp.floor(jnp.arange(size) * (in_size / size)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, in_size - 1)
    return jnp.take(x, idx, axis=-1)


def interpolate_linear(x, size: int, *, align_corners: bool = False):
    """F.interpolate(x, size=size, mode="linear") along the last axis."""
    in_size = x.shape[-1]
    if in_size == 1:
        return jnp.broadcast_to(x, x.shape[:-1] + (size,))
    pos = jnp.arange(size, dtype=jnp.float32)
    if align_corners:
        src = pos * ((in_size - 1) / max(size - 1, 1))
    else:
        scale = in_size / size
        src = jnp.clip((pos + 0.5) * scale - 0.5, 0.0, None)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo.astype(jnp.float32)).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=-1)
    x_hi = jnp.take(x, hi, axis=-1)
    return x_lo + (x_hi - x_lo) * frac
