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


def _conv_specs(kernel_sizes, dilations):
    """Per-resblock flat conv list [(taps, tap_stride), ...] in execution
    order: each dilation d yields the (d, 1) conv pair of the reference
    ResBlock1 (residuals.py:32-53)."""
    return tuple(
        tuple((k, dil) for d in dils for dil in (d, 1))
        for k, dils in zip(kernel_sizes, dilations)
    )


def _specs_halo(conv_specs) -> int:
    return max(
        sum(dil * (k - 1) // 2 for k, dil in specs) for specs in conv_specs
    )


def halo_for(kernel_sizes, dilations) -> int:
    """Per-side context consumed by the deepest resblock chain."""
    return _specs_halo(_conv_specs(kernel_sizes, dilations))


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


def _make_kernel(C, Tt, H, conv_specs, lrelu_slope, n_convs,
                 n_tiles, seq_len, split: int = 1):
    n_res = len(conv_specs)

    def kernel(x_ref, *refs):
        w_list = refs[0 : 2 * n_convs : 2]
        b_list = refs[1 : 2 * n_convs : 2]
        out_ref = refs[2 * n_convs]
        # VMEM im2col scratch(es), each (kmax*C, Tt+2H). split > 1 divides
        # every conv's GEMM into column pieces on ALTERNATING scratches:
        # piece p+1's im2col build (VPU copies) is independent of piece
        # p's GEMM (MXU, reads the other scratch), so Mosaic can overlap
        # them — the kernel is VPU-bound (im2col copies) with the MXU
        # idle during builds (ROUND_NOTES r3), and the conv chain's data
        # dependency forbids prefetching ACROSS convs.
        #
        # MEASURED NO-WIN on v5e at every production shape (round 4,
        # tools/bench_split.py + interleaved A/B in bench_split_ab.py):
        # C128 t1024 0.066->0.077, C64 t2048 0.068->0.073, C32-fold4
        # t2048 median 0.0694 vs 0.0698. Apparent wins at wider-than-
        # production tiles were relay drift. Production keeps split=1;
        # the parameter stays for re-measurement on other TPU generations.
        scratches = refs[2 * n_convs + 1 : 2 * n_convs + 1 + split]

        # absolute sequence position of buffer column 0 for this tile:
        # reference convs zero-pad at sequence edges before EVERY conv, so
        # out-of-sequence halo must be zeroed at each step, not just on input
        tile_i = pl.program_id(0) % n_tiles
        base = tile_i * Tt - H

        # Elementwise stays f32 and every tile runs the masked chain:
        # two variants measured on v5e and REJECTED (tools/bench_fold.py,
        # see ROUND_NOTES) — (a) elementwise in bf16 (packed-lane
        # selects/multiplies cost more than the halved VMEM traffic saves;
        # C32fold 0.072->0.089 s; Mosaic also lacks bf16 cmpf, forcing an
        # f32 compare anyway), (b) a pl.when interior/edge split skipping
        # the per-conv edge zeroing on interior tiles (no win at any
        # production shape — the doubled unrolled chain costs scheduling
        # more than 18 iota+selects cost VPU).
        x_full = x_ref[0].astype(jnp.float32)  # (C, Tt+2H)
        acc = jnp.zeros((C, Tt), jnp.float32)

        conv_idx = 0
        for r in range(n_res):
            specs = conv_specs[r]
            cur = x_full
            width = Tt + 2 * H
            consumed = 0  # columns trimmed from the left so far
            for pair_i in range(len(specs) // 2):
                res_in = cur  # residual source for this conv pair
                for k, dil in specs[2 * pair_i : 2 * pair_i + 2]:
                    ext = dil * (k - 1) // 2
                    out_w = width - 2 * ext
                    src = jnp.where(cur > 0, cur, cur * lrelu_slope)
                    pos = (
                        base + consumed
                        + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
                    )
                    src = jnp.where((pos >= 0) & (pos < seq_len), src, 0.0)
                    # im2col + one GEMM per conv (column-split over the
                    # scratches when split > 1; per-column contraction is
                    # independent, so pieces are bit-identical to the
                    # full-width dot). (A per-tap accumulated-GEMM variant
                    # without the im2col scratch measured 5-8% SLOWER at
                    # every production shape on v5e.)
                    # bf16 x bf16 -> f32 accumulate: both operands are
                    # already bf16-stored (weights packed bf16, im2col
                    # scratch bf16), and bf16 products are EXACT in f32
                    # (8-bit mantissas), so this equals the former
                    # f32-cast dot while running single-pass on the MXU
                    # instead of multi-pass fp32 emulation (~3x: the f32
                    # variant measured at the fp32-MXU ceiling, ~60 TF/s)
                    pw = -(-out_w // split)
                    ys = []
                    for pc in range(split):
                        lo = pc * pw
                        wp = min(out_w - lo, pw)
                        if wp <= 0:
                            break
                        sc = scratches[pc]
                        for kk in range(k):
                            sc[kk * C : (kk + 1) * C, :wp] = src[
                                :, lo + kk * dil : lo + kk * dil + wp
                            ].astype(sc.dtype)
                        ys.append(jax.lax.dot_general(
                            w_list[conv_idx][:],
                            sc[: k * C, :wp],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                    y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=1)
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
    split: int = 1,
):
    """x: (B, C, T) -> mean_r resblock_r(x), shape (B, C, T).

    Drop-in equivalent of the XLA path in models.nsf (sum/num_kernels of
    reference ResBlock1 stacks). T is padded up to a tile multiple
    internally and trimmed on return.
    """
    b, c, t = x.shape
    conv_specs = _conv_specs(kernel_sizes, dilations)
    if packed is None:
        packed = pack_resblock_weights(params_list, kernel_sizes, dilations)
    return _fused_group_call(
        x, packed, conv_specs, lrelu_slope=lrelu_slope, time_tile=time_tile,
        interpret=interpret, split=split,
    )


def _fused_group_call(x, packed, conv_specs, *, lrelu_slope, time_tile,
                      interpret, split: int = 1):
    """Shared pallas_call driver for the plain and time-folded variants."""
    b, c, t = x.shape
    n_res = len(conv_specs)
    h = _specs_halo(conv_specs)
    kmax = max(k for specs in conv_specs for k, _ in specs)
    t_pad = (-t) % time_tile
    n_tiles = (t + t_pad) // time_tile

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
        c, time_tile, h, conv_specs, lrelu_slope, n_convs, n_tiles, t,
        split=split,
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
            pltpu.VMEM((kmax * c, time_tile + 2 * h), jnp.bfloat16)
            for _ in range(split)
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tiles, *flat_wb)

    out = out.reshape(b, n_tiles, c, time_tile).swapaxes(1, 2).reshape(b, c, -1)
    return out[:, :, :t]


# ----------------------------------------------------------------------
# time-folded variant (space-to-depth on the sample axis)
# ----------------------------------------------------------------------
#
# The decoder's late stages have C=32..64 output channels: the GEMM's M
# dimension fills 1/4..1/2 of the MXU's 128 rows, and measured on v5e the
# low-M matmuls also fail to spread across the TensorCore's MXUs (s1's
# C=128 stage runs ~3.3x more passes/second than the C=32 stage). Folding
# time by F re-expresses each dilated conv as a dilation-1 conv over T/F
# columns with F*C channels: phase-minor layout xf[c*F + p, i] =
# x[c, i*F + p], weights pre-scattered so that output row o*F+p collects
# exactly the reference taps. At C=32, F=4: M=128 (full), and the K
# granularity waste (k*32 vs multiples of 128) disappears into wider
# folded taps. Sequence-edge zeroing stays exact because the audio length
# at every decoder stage is a multiple of F, so unfolded edge columns
# align with folded ones.


def _fold_conv_weights(w, bias, dil, fold, dtype=jnp.bfloat16):
    """(O, I, K) dilation-`dil` conv -> folded dilation-1 conv im2col pair
    ((O*fold, k_eff*I*fold), (O*fold, 1)) in phase-minor channel layout."""
    w = jnp.asarray(w)  # may be a tracer: folding happens at trace time
    o, i, k = w.shape
    ctr = (k - 1) // 2
    # g[p, j]: unfolded offset of tap j for output phase p (static numpy)
    g = np.arange(fold)[:, None] + (np.arange(k)[None, :] - ctr) * dil
    off = g // fold
    q = g - off * fold
    omin, omax = int(off.min()), int(off.max())
    if omin != -omax:  # the kernel assumes symmetric 'same' windows
        raise ValueError(
            f"asymmetric folded window for k={k} dil={dil} fold={fold}"
        )
    k_eff = omax - omin + 1
    wf = jnp.zeros((o * fold, k_eff, i * fold), w.dtype)
    for p in range(fold):
        for j in range(k):
            wf = wf.at[p::fold, off[p, j] - omin, q[p, j]::fold].set(
                w[:, :, j]
            )
    w_im = wf.reshape(o * fold, k_eff * i * fold).astype(dtype)
    b_f = jnp.repeat(
        jnp.asarray(bias, jnp.float32), fold
    ).reshape(o * fold, 1)
    return w_im, b_f, k_eff


def pack_folded_resblock_weights(params_list, kernel_sizes, dilations, fold,
                                 dtype=jnp.bfloat16):
    """Fold every conv of the group; returns (packed, conv_specs) for
    _fused_group_call in folded space."""
    packed = []
    conv_specs = []
    for r, p in enumerate(params_list):
        specs = []
        for i in range(len(dilations[r])):
            for conv, dil in ((p["convs1"][i], dilations[r][i]),
                              (p["convs2"][i], 1)):
                w_im, b_f, k_eff = _fold_conv_weights(
                    conv["w"], conv["b"], dil, fold, dtype
                )
                packed.append((w_im, b_f))
                specs.append((k_eff, 1))
        conv_specs.append(tuple(specs))
    return packed, tuple(conv_specs)


def fold_time(x, fold):
    """(B, C, T) -> (B, C*fold, T//fold), phase-minor: row c*fold+p holds
    samples t with t % fold == p."""
    b, c, t = x.shape
    return (
        x.reshape(b, c, t // fold, fold)
        .transpose(0, 1, 3, 2)
        .reshape(b, c * fold, t // fold)
    )


def unfold_time(x, fold):
    b, cf, tf = x.shape
    return (
        x.reshape(b, cf // fold, fold, tf)
        .transpose(0, 1, 3, 2)
        .reshape(b, cf // fold, tf * fold)
    )


def fused_resblock_group_folded(
    x,
    params_list,
    *,
    kernel_sizes,
    dilations,
    fold: int = 4,
    lrelu_slope: float = 0.1,
    time_tile: int = 1024,
    interpret: bool = False,
    packed=None,
    split: int = 1,
):
    """Time-folded fused resblock group: numerically equivalent to
    fused_resblock_group (and the XLA path) for T % fold == 0."""
    b, c, t = x.shape
    if t % fold:
        raise ValueError(f"T={t} not a multiple of fold={fold}")
    if packed is None:
        packed, conv_specs = pack_folded_resblock_weights(
            params_list, kernel_sizes, dilations, fold
        )
    else:
        packed, conv_specs = packed
    xf = fold_time(x, fold)
    out = _fused_group_call(
        xf, packed, conv_specs, lrelu_slope=lrelu_slope,
        time_tile=time_tile, interpret=interpret, split=split,
    )
    return unfold_time(out, fold)
