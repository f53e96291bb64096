"""Pallas TPU kernel: fused, W-folded ConvBlockRes chains for RMVPE's U-Net.

The reference U-Net (RMVPE.py:140-307) runs 3x3 convs at 16-64 channels
over a (T, 128-mel) grid. Under XLA's conv lowering those stages present
M=C_out=16..64 to the MXU (most of the systolic array's 128 rows idle) and
K=9*C_in with heavy tile-granularity waste. Folding the mel axis into
channels (space-to-depth by Fw, phase-minor: channel c*Fw+q holds mel
column w'*Fw+q) makes every level-1..4 conv an EXACT M=128, K=9*128 GEMM —
zero MXU tile waste:

  level  C    W    Fw   folded shape
  1      16   128  8    (128, 16, T)
  2      32   64   4    (128, 16, T/2)
  3      64   32   2    (128, 16, T/4)
  4      128  16   1    (128, 16, T/8)

A whole level's ConvBlockRes chain (conv-relu-conv-relu + residual, with
the optional 1x1 shortcut on channel-changing first blocks) fuses into one
VMEM-resident pass per T-tile. W'(=16) mel planes loop inside the kernel;
T rides the lane axis. W-edge zero padding is exact because W % Fw == 0,
so folded planes align with the original mel boundary; T-edge zeroing
masks against the absolute sequence position like ops/pallas_resblock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_w(x, fold):
    """(B, C, T, W) -> (B, C*fold, T, W//fold), phase-minor on W."""
    b, c, t, w = x.shape
    # [b, c, t, w', q] -> [b, c, q, t, w']
    return (
        x.reshape(b, c, t, w // fold, fold)
        .transpose(0, 1, 4, 2, 3)
        .reshape(b, c * fold, t, w // fold)
    )


def unfold_w(x, fold):
    b, cf, t, wf = x.shape
    return (
        x.reshape(b, cf // fold, fold, t, wf)
        .transpose(0, 1, 3, 4, 2)
        .reshape(b, cf // fold, t, wf * fold)
    )


def _fold_conv3x3(w, bias, fold, dtype=jnp.bfloat16):
    """(O, I, 3, 3) 'same' conv -> folded im2col pair:
    ((O*fold, 9*I*fold), (O*fold, 1)).

    im2col row-block order: (dw, dt) major (dw, dt in -1..1), channel minor
    — must match the kernel's gather order."""
    w = jnp.asarray(w)
    o, i, kh, kw = w.shape
    assert kh == 3 and kw == 3
    wf = jnp.zeros((o * fold, 3, 3, i * fold), w.dtype)
    for qo in range(fold):
        for dwq in (-1, 0, 1):  # original W tap offset
            qi = (qo + dwq) % fold
            dw = (qo + dwq) // fold  # folded W-plane offset in -1..1
            for dt in (-1, 0, 1):
                # w index: [o, i, kh=dt+1, kw=dwq+1]
                wf = wf.at[qo::fold, dw + 1, dt + 1, qi::fold].set(
                    w[:, :, dt + 1, dwq + 1]
                )
    w_im = wf.reshape(o * fold, 9 * i * fold).astype(dtype)
    b_f = jnp.repeat(jnp.asarray(bias, jnp.float32), fold).reshape(
        o * fold, 1
    )
    return w_im, b_f


def _fold_conv1x1(w, bias, fold, dtype=jnp.bfloat16):
    """(O, I, 1, 1) shortcut -> ((O*fold, I*fold), (O*fold, 1)):
    block-diagonal over fold phases."""
    w = jnp.asarray(w)[:, :, 0, 0]
    o, i = w.shape
    wf = jnp.zeros((o * fold, i * fold), w.dtype)
    for q in range(fold):
        wf = wf.at[q::fold, q::fold].set(w)
    b_f = jnp.repeat(jnp.asarray(bias, jnp.float32), fold).reshape(
        o * fold, 1
    )
    return wf.astype(dtype), b_f


def pack_folded_blocks(blocks, fold, dtype=jnp.bfloat16):
    """[{conv1, conv2, shortcut?}] -> flat [(w_im, b)], + per-block
    channel spec [(c_in', c_out', has_shortcut)]."""
    packed = []
    spec = []
    for blk in blocks:
        w1, b1 = _fold_conv3x3(blk["conv1"]["w"], blk["conv1"]["b"], fold, dtype)
        w2, b2 = _fold_conv3x3(blk["conv2"]["w"], blk["conv2"]["b"], fold, dtype)
        packed.append((w1, b1))
        packed.append((w2, b2))
        has_sc = "shortcut" in blk
        if has_sc:
            ws, bs = _fold_conv1x1(
                blk["shortcut"]["w"], blk["shortcut"]["b"], fold, dtype
            )
            packed.append((ws, bs))
        c_in = w1.shape[1] // 9
        c_out = w1.shape[0]
        spec.append((c_in, c_out, has_sc))
    return packed, tuple(spec)


def _make_kernel(spec, Wp, Tt, H, n_wb, n_tiles, seq_len):
    n_blocks = len(spec)
    c_in0 = spec[0][0]
    c_max = max(max(ci, co) for ci, co, _ in spec)

    def kernel(x_ref, *refs):
        wb = refs[:n_wb]
        out_ref = refs[n_wb]
        im2col = refs[n_wb + 1]   # (9*c_max, Tt+2H) bf16
        buf_a = refs[n_wb + 2]    # (Wp, c_max, Tt+2H) f32 ping
        buf_b = refs[n_wb + 3]    # (Wp, c_max, Tt+2H) f32 pong

        tile_i = pl.program_id(0) % n_tiles
        base = tile_i * Tt - H

        width = Tt + 2 * H
        for wp in range(Wp):
            buf_a[wp, :c_in0, :] = x_ref[0, wp].astype(jnp.float32)

        # ping-pong: conv1 reads A writes B; conv2 reads B writes A with the
        # residual (still intact in A, read before each plane's write)
        # folded into the same store — after every block `cur` is buf_a
        cur, nxt = buf_a, buf_b
        c_cur = c_in0
        consumed = 0
        wb_i = 0
        for ci, co, has_sc in spec:
            sc_idx = wb_i + 2 if has_sc else None
            for conv_j in (0, 1):
                w_im = wb[2 * wb_i][:]
                bias = wb[2 * wb_i + 1][:]
                wb_i += 1
                out_w = width - 2
                c_src = ci if conv_j == 0 else co
                for wp in range(Wp):
                    # gather im2col: (dw, dt) blocks of the three W-planes
                    for dwi, dw in enumerate((-1, 0, 1)):
                        wq = wp + dw
                        for dti, dt in enumerate((-1, 0, 1)):
                            blk_row = (dwi * 3 + dti) * c_src
                            if 0 <= wq < Wp:
                                src = cur[wq, :c_src,
                                          1 + dt : 1 + dt + out_w]
                                # T-boundary zeroing ('same' conv pad):
                                # positions outside [0, seq_len) are zero
                                pos = (
                                    base + consumed + 1 + dt
                                    + jax.lax.broadcasted_iota(
                                        jnp.int32, (1, out_w), 1
                                    )
                                )
                                src = jnp.where(
                                    (pos >= 0) & (pos < seq_len), src, 0.0
                                )
                                im2col[blk_row : blk_row + c_src, :out_w] = (
                                    src.astype(im2col.dtype)
                                )
                            else:
                                im2col[blk_row : blk_row + c_src, :out_w] = (
                                    jnp.zeros((c_src, out_w), im2col.dtype)
                                )
                    y = jax.lax.dot_general(
                        w_im.astype(jnp.float32),
                        im2col[: 9 * c_src, :out_w].astype(jnp.float32),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    y = jnp.maximum(y + bias, 0.0)
                    if conv_j == 1:
                        # residual source: block input, still in `nxt`
                        # (=buf_a), trimmed by the block's two shrinks
                        if sc_idx is not None:
                            r = jax.lax.dot_general(
                                wb[2 * sc_idx][:].astype(jnp.float32),
                                nxt[wp, :ci, 2 : 2 + out_w].astype(
                                    jnp.float32
                                ),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ) + wb[2 * sc_idx + 1][:]
                        else:
                            r = nxt[wp, :co, 2 : 2 + out_w]
                        y = y + r
                    nxt[wp, :co, :out_w] = y
                cur, nxt = nxt, cur
                width = out_w
                consumed += 1
            if has_sc:
                wb_i += 1  # shortcut weights consumed inline above
            c_cur = co

        start = (width - Tt) // 2
        for wp in range(Wp):
            out_ref[0, wp] = cur[wp, :c_cur, start : start + Tt].astype(
                out_ref.dtype
            )

    return kernel


def fused_convblock_chain_folded(
    x,
    blocks,
    *,
    fold: int,
    time_tile: int = 256,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """(1, C, T, W) -> ConvBlockRes chain output, via W-folded fused kernel.

    Equivalent to models.rmvpe._block_chain (reference RMVPE.py:140-175
    semantics: two 3x3 'same' convs + ReLU each + residual, optional 1x1
    shortcut when channels change)."""
    b, c, t, w = x.shape
    if b != 1:
        raise ValueError("B=1 only (RMVPE runs one song per graph)")
    if w % fold:
        raise ValueError(f"W={w} not a multiple of fold={fold}")

    packed, spec = pack_folded_blocks(blocks, fold, compute_dtype)
    n_convs = len(packed)
    flat_wb = [a for pair in packed for a in pair]
    wp = w // fold
    c_out = spec[-1][1]
    c_max = max(max(ci, co) for ci, co, _ in spec)
    c_out_max = max(co for _, co, _ in spec)
    h = 2 * len(spec)  # one T-column per side per conv

    xf = fold_w(x, fold)            # (1, C*fold, T, W')
    xf = xf.transpose(0, 3, 1, 2)   # (1, W', C', T)

    t_pad = (-t) % time_tile
    n_tiles = (t + t_pad) // time_tile
    xp = jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (h, h + t_pad)))
    starts = np.arange(n_tiles) * time_tile
    idx = starts[:, None] + np.arange(time_tile + 2 * h)[None, :]
    tiles = xp[:, :, :, idx]        # (1, W', C', n_tiles, Tt+2h)
    tiles = tiles.transpose(0, 3, 1, 2, 4).reshape(
        n_tiles, wp, c * fold, time_tile + 2 * h
    ).astype(compute_dtype)  # rounded at im2col anyway; halves the block

    kernel = _make_kernel(spec, wp, time_tile, h, 2 * n_convs, n_tiles, t)

    wb_specs = []
    for w_im, bias in packed:
        wb_specs.append(pl.BlockSpec(
            w_im.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        wb_specs.append(pl.BlockSpec(
            bias.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, wp, c * fold, time_tile + 2 * h),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, wp, c_out, time_tile),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, wp, c_out, time_tile), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((9 * c_max, time_tile + 2 * h), compute_dtype),
            # ping (block inputs/outputs): widest channel count; pong only
            # ever holds conv1 outputs (max c_out' <= 128)
            pltpu.VMEM((wp, c_max, time_tile + 2 * h), jnp.float32),
            pltpu.VMEM((wp, c_out_max, time_tile + 2 * h), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tiles, *flat_wb)

    # (n_tiles, W', C_out', Tt) -> (1, W', C_out', T) -> unfold
    out = out.transpose(1, 2, 0, 3).reshape(1, wp, c_out, n_tiles * time_tile)
    out = out[:, :, :, :t].transpose(0, 2, 3, 1)  # (1, C_out', T, W')
    return unfold_w(out, fold)
