"""Pallas TPU kernel: fused HiFi-GAN resblock group.

The NSF decoder's residual-block stacks dominate conversion FLOPs
(~6.3 of ~9.7 TFLOP per minute of 48 kHz audio) yet run at ~6% MXU
utilization under XLA's generic 1-D conv lowering: late stages have only
32-128 channels, so the implicit GEMM puts a tiny dimension on the MXU.

This kernel retiles the problem TPU-first:
  - time tiles ride the lane axis (512 wide),
  - each conv is an im2col matmul with contraction C_in*k (>=352 even at 32
    channels) built in VMEM,
  - the whole 3-resblock group — 18 dilated convs, leaky-relus, residual
    adds, and the final mean — fuses into one VMEM-resident pass per
    (batch x time-tile) grid cell.
Zero "same" padding at sequence edges comes from a host-side pad, so
interior tiles read real neighbours and edge tiles read zeros, exactly
matching reference ResBlock semantics (residuals.py:32-53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def halo_for(kernel_sizes, dilations) -> int:
    """Per-side context consumed by the deepest resblock chain."""
    return max(
        sum((d + 1) * (k - 1) // 2 for d in dils)
        for k, dils in zip(kernel_sizes, dilations)
    )


def pack_resblock_weights(params_list, kernel_sizes, dilations, dtype=jnp.bfloat16):
    """Repack {'convs1': [...], 'convs2': [...]} params into im2col layout:
    flat [(w_im (C_out, k*C_in), bias (C_out, 1)), ...] ordered
    (resblock, layer, conv1-then-conv2)."""
    packed = []
    for r, p in enumerate(params_list):
        for i in range(len(dilations[r])):
            for conv in (p["convs1"][i], p["convs2"][i]):
                w = jnp.asarray(conv["w"])  # (O, I, K)
                o, ci, k = w.shape
                w_im = jnp.transpose(w, (0, 2, 1)).reshape(o, k * ci)
                packed.append(
                    (
                        w_im.astype(dtype),
                        jnp.asarray(conv["b"], jnp.float32).reshape(o, 1),
                    )
                )
    return packed


def _make_kernel(C, Tt, H, kernel_sizes, dilations, lrelu_slope, n_convs,
                 n_tiles, seq_len):
    n_res = len(kernel_sizes)

    def kernel(x_ref, *refs):
        w_list = refs[0 : 2 * n_convs : 2]
        b_list = refs[1 : 2 * n_convs : 2]
        out_ref = refs[2 * n_convs]
        im2col = refs[2 * n_convs + 1]  # VMEM scratch (kmax*C, Tt+2H)

        # absolute sequence position of buffer column 0 for this tile:
        # reference convs zero-pad at sequence edges before EVERY conv, so
        # out-of-sequence halo must be zeroed at each step, not just on input
        tile_i = pl.program_id(0) % n_tiles
        base = tile_i * Tt - H

        x_full = x_ref[0].astype(jnp.float32)  # (C, Tt+2H)
        acc = jnp.zeros((C, Tt), jnp.float32)

        conv_idx = 0
        for r in range(n_res):
            k = kernel_sizes[r]
            cur = x_full
            width = Tt + 2 * H
            consumed = 0  # columns trimmed from the left so far
            for d in dilations[r]:
                res_in = cur  # residual source for this conv pair
                for dil in (d, 1):
                    ext = dil * (k - 1) // 2
                    out_w = width - 2 * ext
                    src = jnp.where(cur > 0, cur, cur * lrelu_slope)
                    pos = (
                        base + consumed
                        + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
                    )
                    src = jnp.where((pos >= 0) & (pos < seq_len), src, 0.0)
                    for kk in range(k):
                        im2col[kk * C : (kk + 1) * C, :out_w] = src[
                            :, kk * dil : kk * dil + out_w
                        ].astype(im2col.dtype)
                    y = jax.lax.dot_general(
                        w_list[conv_idx][:].astype(jnp.float32),
                        im2col[: k * C, :out_w].astype(jnp.float32),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    cur = y + b_list[conv_idx][:]
                    conv_idx += 1
                    width = out_w
                    consumed += ext
                # residual: res_in trimmed by both exts of the pair
                trim = (res_in.shape[1] - width) // 2
                cur = cur + res_in[:, trim : trim + width]
            start = (width - Tt) // 2
            acc = acc + cur[:, start : start + Tt]

        out_ref[0] = (acc / n_res).astype(out_ref.dtype)

    return kernel


def fused_resblock_group(
    x,
    params_list,
    *,
    kernel_sizes,
    dilations,
    lrelu_slope: float = 0.1,
    time_tile: int = 512,
    interpret: bool = False,
    packed=None,
):
    """x: (B, C, T) -> mean_r resblock_r(x), shape (B, C, T).

    Drop-in equivalent of the XLA path in models.nsf (sum/num_kernels of
    reference ResBlock1 stacks). T is padded up to a tile multiple
    internally and trimmed on return.
    """
    b, c, t = x.shape
    n_res = len(kernel_sizes)
    h = halo_for(kernel_sizes, dilations)
    kmax = max(kernel_sizes)
    t_pad = (-t) % time_tile
    n_tiles = (t + t_pad) // time_tile

    if packed is None:
        packed = pack_resblock_weights(params_list, kernel_sizes, dilations)
    n_convs = len(packed)
    flat_wb = [a for pair in packed for a in pair]

    # zero-pad edges (reference "same" conv) + tile-align the tail
    xp = jnp.pad(x, ((0, 0), (0, 0), (h, h + t_pad)))
    # overlapping tiles: (B*n_tiles, C, Tt+2H)
    starts = np.arange(n_tiles) * time_tile
    idx = starts[:, None] + np.arange(time_tile + 2 * h)[None, :]
    tiles = xp[:, :, idx]  # (B, C, n_tiles, W)
    tiles = jnp.transpose(tiles, (0, 2, 1, 3)).reshape(
        b * n_tiles, c, time_tile + 2 * h
    )

    kernel = _make_kernel(
        c, time_tile, h, tuple(kernel_sizes),
        tuple(tuple(d) for d in dilations), lrelu_slope, n_convs,
        n_tiles, t,
    )

    wb_specs = []
    for pair_i in range(n_convs):
        w, bias = packed[pair_i]
        wb_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        wb_specs.append(
            pl.BlockSpec(bias.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        kernel,
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, c, time_tile + 2 * h),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, c, time_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, c, time_tile), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kmax * c, time_tile + 2 * h), jnp.bfloat16),
        ],
        interpret=interpret,
    )(tiles, *flat_wb)

    out = out.reshape(b, n_tiles, c, time_tile).swapaxes(1, 2).reshape(b, c, -1)
    return out[:, :, :t]
