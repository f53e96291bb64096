"""Flash-attention path for the VITS windowed relative-position attention.

TPU-only: wraps jax's Pallas flash kernel for the O(T^2) content term (one
streaming pass instead of materialized scores/softmax round-trips) and
reconstructs the +-w rel-value term exactly from the kernel's softmax
residuals (lse = m + log l):

    p[t, t+d] = exp(score[t, t+d] - lse[t])   for |d| <= w
    out[t]   += sum_d p[t, t+d] * rel_v[d]

score bands are recomputed directly (21 shifted row-dot products — O(T w d)
flops, no T^2 memory). Equivalent to models.synthesizer.relative_attention;
parity is asserted on-device by tools/validate_flash_attention.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .conv import conv1d


def _shifted_rowdot(q, k, w: int):
    """qk band: band[..., t, d+w] = sum_dk q[..., t, :] * k[..., t+d, :]."""
    outs = []
    t = q.shape[-2]
    for d in range(-w, w + 1):
        if d < 0:
            ks = jnp.pad(k[..., :t + d, :], [(0, 0)] * (k.ndim - 2) + [(-d, 0), (0, 0)])
        elif d > 0:
            ks = jnp.pad(k[..., d:, :], [(0, 0)] * (k.ndim - 2) + [(0, d), (0, 0)])
        else:
            ks = k
        outs.append(jnp.sum(q * ks, axis=-1))
    return jnp.stack(outs, axis=-1)  # (..., T, 2w+1)


def relative_attention_flash(x, params, *, n_heads: int, window_size: int,
                             frame_mask=None, block: int = 128):
    """Drop-in for relative_attention: (B, C, T) -> (B, C, T).

    frame_mask: (B, 1, T) validity mask (the engine's chunk masks are
    contiguous-prefix, handled via flash segment ids)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    from polgen_rvc_tpu.models.synthesizer import _band_to_dense

    b, c, t = x.shape
    dk = c // n_heads
    w = window_size
    scale = 1.0 / math.sqrt(dk)

    q = conv1d(x, params["q"]["w"], params["q"]["b"])
    k = conv1d(x, params["k"]["w"], params["k"]["b"])
    v = conv1d(x, params["v"]["w"], params["v"]["b"])

    def split_heads(y):
        return y.reshape(b, n_heads, dk, t).swapaxes(2, 3)  # (B, H, T, dk)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)

    # rel-key logits as a band; kernel adds ab BEFORE sm_scale, so divide out
    rel_k = params["emb_rel_k"].astype(x.dtype)  # (1, 2w+1, dk)
    band_logits = jnp.einsum("bhtd,xrd->bhtr", q * scale, rel_k)  # scaled
    ab = _band_to_dense(band_logits, t, w) / scale

    # pad T to a block multiple; segment ids mask pad rows/cols
    t_pad = (-t) % block
    tp = t + t_pad

    def padt(y):
        return jnp.pad(y, ((0, 0), (0, 0), (0, t_pad), (0, 0)))

    qp, kp, vp = padt(q), padt(k), padt(v)
    abp = jnp.pad(ab, ((0, 0), (0, 0), (0, t_pad), (0, t_pad)))
    if frame_mask is not None:
        valid_t = frame_mask[:, 0, :] > 0  # (B, T)
    else:
        valid_t = jnp.ones((b, t), bool)
    seg = jnp.concatenate(
        [jnp.where(valid_t, 1, 2).astype(jnp.int32),
         jnp.full((b, t_pad), 2, jnp.int32)], axis=1
    )
    segment_ids = fa.SegmentIds(q=seg, kv=seg)

    out, l, m = fa._flash_attention_impl(
        qp.astype(jnp.float32), kp.astype(jnp.float32), vp.astype(jnp.float32),
        abp.astype(jnp.float32), segment_ids,
        True,   # save_residuals
        False,  # causal
        scale,  # sm_scale
        1, block, block, block,  # block_b, block_q, block_k_major, block_k
        False,  # debug
    )
    out = out[:, :, :t].astype(x.dtype)
    if l.ndim == 4:  # some jax versions return (B, H, T, lanes)
        l, m = l[..., 0], m[..., 0]
    lse = (m + jnp.log(l))[:, :, :t]  # (B, H, T)

    # rel-value term from reconstructed band probabilities
    qk_band = _shifted_rowdot(q * scale, k, w)  # (B, H, T, 2w+1)
    band_scores = qk_band + band_logits
    d_idx = jnp.arange(t)[:, None] + jnp.arange(-w, w + 1)[None, :]
    in_range = ((d_idx >= 0) & (d_idx < t)).astype(jnp.float32)[None, None]
    # exclude masked frames from the band too (kernel masked them via segs)
    col_valid = valid_t.astype(jnp.float32)[:, jnp.clip(d_idx, 0, t - 1)]
    col_valid = col_valid[:, None]  # (B, 1, T, 2w+1)
    p_band = (
        jnp.exp(band_scores.astype(jnp.float32) - lse[..., None])
        * in_range * col_valid
    )
    rel_v = params["emb_rel_v"].astype(jnp.float32)
    out = out + jnp.einsum("bhtr,xrd->bhtd", p_band, rel_v).astype(x.dtype)

    out = out.swapaxes(2, 3).reshape(b, c, t)
    return conv1d(out, params["o"]["w"], params["o"]["b"])
