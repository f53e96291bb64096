"""Convolutions with PyTorch layout/padding semantics, built on lax.

Weight layouts follow torch so converted checkpoints drop straight in:
  conv1d:            w (out, in/groups, k)
  conv2d:            w (out, in/groups, kh, kw)
  conv_transpose1d:  w (in, out/groups, k)
  conv_transpose2d:  w (in, out/groups, kh, kw)

Reference behaviours covered: the synthesizer's Conv1d/ConvTranspose1d stacks
(/root/reference/rvc/lib/algorithm/nsf.py:64-111, residuals.py:15-25), the
RMVPE U-Net's Conv2d/ConvTranspose2d (/root/reference/rvc/lib/predictors/
RMVPE.py:140-307) and HuBERT's strided/grouped conv extractor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def conv1d(
    x,
    w,
    b=None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
):
    """torch.nn.functional.conv1d. x: (B, C, T), w: (O, I/g, K) -> (B, O, T')."""
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None]
    return out


def conv2d(
    x,
    w,
    b=None,
    *,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
    precision=None,
    preferred_element_type=None,
):
    """torch.nn.functional.conv2d. x: (B, C, H, W), w: (O, I/g, KH, KW).

    preferred_element_type requests a wider accumulator/output than the
    operand dtype (e.g. bf16 multiplicands with an f32 result — the MXU
    accumulates f32 natively, so this costs nothing)."""
    stride, dilation = _pair(stride), _pair(dilation)
    ph, pw = _pair(padding)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None, None]
    return out


def conv_transpose1d(
    x,
    w,
    b=None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
):
    """torch.nn.functional.conv_transpose1d (groups=1).

    x: (B, I, T), w torch layout (I, O, K) -> (B, O, (T-1)*s - 2p + K + op).

    Implemented as a regular convolution of the stride-dilated input with the
    spatially-flipped, channel-swapped kernel — the XLA-native formulation
    (maps onto the MXU like any conv; no scatter).
    """
    k = w.shape[-1]
    w_conv = jnp.flip(w, axis=-1).swapaxes(0, 1)  # (O, I, K)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x,
        w_conv.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None]
    return out


def conv_transpose2d(
    x,
    w,
    b=None,
    *,
    stride=1,
    padding=0,
    output_padding=0,
    precision=None,
):
    """torch.nn.functional.conv_transpose2d (groups=1).

    x: (B, I, H, W), w torch layout (I, O, KH, KW).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[-2], w.shape[-1]
    w_conv = jnp.flip(w, axis=(-2, -1)).swapaxes(0, 1)  # (O, I, KH, KW)
    out = lax.conv_general_dilated(
        x,
        w_conv.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None, None]
    return out
