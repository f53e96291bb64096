"""Pallas TPU kernel: fused RMVPE ConvBlockRes chains.

The RMVPE U-Net (models/rmvpe.py) is a stack of 3x3 conv blocks over a
(T, mel) image whose channel counts (16..128) starve the MXU under XLA's
conv lowering — the same pathology as the NSF decoder. This kernel runs a
whole 4-ConvBlockRes chain (8 convs + ReLUs + shortcut residuals) in VMEM
per time-tile grid cell:

  - the (T, W) image flattens onto the lane axis with one zero column each
    side of W, so a 3x3 tap becomes one flat offset dt*(W+2)+dw and im2col
    is 9 contiguous VMEM copies;
  - every conv trims a full (W+2)-aligned 2 rows per side, keeping the
    pad-column layout static so out-of-image zeros are re-imposed before
    each conv (the reference zero-pads every conv — RMVPE.py:140-175);
  - the contraction is 9*C_in (>=144 even at 16 channels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_CONV = 2  # aligned trim per side per conv


def pack_block_weights(blocks, dtype=jnp.bfloat16):
    """[{conv1:{w,b}, conv2:{w,b}, shortcut?:{w,b}}] -> flat tensor list +
    layout metadata. Conv (O, I, 3, 3) -> (O, 9*I) rows [(dt*3+dw)*I + i];
    shortcut (O, I, 1, 1) -> (O, I)."""
    flat, meta = [], []
    for blk in blocks:
        c_in = blk["conv1"]["w"].shape[1]
        c_out = blk["conv1"]["w"].shape[0]
        for name in ("conv1", "conv2"):
            w = jnp.asarray(blk[name]["w"])
            o, i, _, _ = w.shape
            flat.append(jnp.transpose(w, (0, 2, 3, 1)).reshape(o, 9 * i).astype(dtype))
            flat.append(jnp.asarray(blk[name]["b"], jnp.float32).reshape(o, 1))
        has_sc = "shortcut" in blk
        if has_sc:
            flat.append(jnp.asarray(blk["shortcut"]["w"])[:, :, 0, 0].astype(dtype))
            flat.append(
                jnp.asarray(blk["shortcut"]["b"], jnp.float32).reshape(-1, 1)
            )
        meta.append((c_in, c_out, has_sc))
    return flat, tuple(meta)


def _kernel(x_ref, *refs, Tt, H, W, T, meta, n_wb):
    wp = W + 2
    wb = refs[:n_wb]
    out_ref = refs[n_wb]
    im2col = refs[n_wb + 1]

    base = pl.program_id(0) * Tt - H  # image row of buffer row 0 (pre-trim)

    cur = x_ref[0].astype(jnp.float32)  # (C_in, (Tt+2H)*wp)
    trimmed = 0  # rows trimmed per side so far
    wi = 0

    def mask_for(buf_cols, trimmed):
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, buf_cols), 1)
        row = base + trimmed + iot // wp
        w = iot % wp
        return ((w >= 1) & (w <= W) & (row >= 0) & (row < T)).astype(jnp.float32)

    for c_in, c_out, has_sc in meta:
        res_src = cur
        for conv_i in range(2):
            ci = cur.shape[0]
            in_cols = cur.shape[1]
            out_cols = in_cols - 2 * ROWS_PER_CONV * wp
            src = cur * mask_for(in_cols, trimmed)
            for dt in range(3):
                for dw in range(3):
                    start = (dt + 1) * wp + dw - 1
                    im2col[(dt * 3 + dw) * ci : (dt * 3 + dw + 1) * ci, :out_cols] = (
                        src[:, start : start + out_cols].astype(im2col.dtype)
                    )
            y = jax.lax.dot_general(
                wb[wi][:].astype(jnp.float32),
                im2col[: 9 * ci, :out_cols].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + wb[wi + 1][:]
            wi += 2
            cur = jnp.maximum(y, 0.0)
            trimmed += ROWS_PER_CONV

        off = 2 * ROWS_PER_CONV * wp  # both convs' trim of the residual
        res = res_src[:, off : res_src.shape[1] - off]
        if has_sc:
            res = jax.lax.dot_general(
                wb[wi][:].astype(jnp.float32), res.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + wb[wi + 1][:]
            wi += 2
        cur = cur + res

    out_ref[0] = cur.astype(out_ref.dtype)


def fused_convblock_chain(x, blocks, *, time_tile: int = 64,
                          interpret: bool = False):
    """x: (1, C_in, T, W) image -> (1, C_out, T, W).

    Chain of ConvBlockRes blocks (conv3x3 -> ReLU -> conv3x3 -> ReLU +
    (shortcut) residual), BatchNorm pre-folded. Mirrors the XLA path in
    models.rmvpe._conv_block_res applied sequentially.
    """
    b, c_in, t, w = x.shape
    assert b == 1
    n_convs = 2 * len(blocks)
    h = ROWS_PER_CONV * n_convs
    wp = w + 2

    t_pad = (-t) % time_tile
    n_tiles = (t + t_pad) // time_tile

    flat_wb, meta = pack_block_weights(blocks)
    c_out = meta[-1][1]
    max_ci = max(m[0] for m in meta)
    max_c = max(max_ci, max(m[1] for m in meta))

    # pad W by 1 zero col each side, T by h (+tail) zeros, flatten rows
    xp = jnp.pad(x[0], ((0, 0), (h, h + t_pad), (1, 1)))
    xp = xp.reshape(c_in, -1)  # (C, (T+2h+t_pad)*wp)

    # overlapping tiles: rows [i*Tt, i*Tt + Tt + 2h)
    cols_tile = (time_tile + 2 * h) * wp
    starts = (np.arange(n_tiles) * time_tile) * wp
    idx = starts[:, None] + np.arange(cols_tile)[None, :]
    tiles = xp[:, idx]  # (C, n_tiles, cols_tile)
    tiles = jnp.swapaxes(tiles, 0, 1)  # (n_tiles, C, cols_tile)

    wb_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in flat_wb
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, Tt=time_tile, H=h, W=w, T=t, meta=meta, n_wb=len(flat_wb)
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, c_in, cols_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, time_tile * wp), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c_out, time_tile * wp), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * max_c, cols_tile), jnp.bfloat16)],
        interpret=interpret,
    )(tiles, *flat_wb)

    out = out.reshape(n_tiles, c_out, time_tile, wp)
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(c_out, n_tiles * time_tile, wp)
    return out[None, :, :t, 1 : 1 + w]
