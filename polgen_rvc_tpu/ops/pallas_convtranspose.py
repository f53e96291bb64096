"""Pallas TPU kernel: strided ConvTranspose1d as a phase-stacked GEMM.

The NSF decoder's upsampling transposed convs (k=2u, pad=(k-u)/2, so
T_out = T_in * u — nsf.py:80-91 semantics) decompose exactly by output
phase r = t mod u: every output sample needs only input positions
{m-1, m, m+1} (m = t div u), with per-phase (C_out, C_in) weight slices.
Stacking all u phases onto the GEMM's M axis gives M = u*C_out (e.g.
12*256 = 3072) with K = 3*C_in — a fully-utilized MXU matmul instead of
XLA's small-channel conv lowering. Zero-padded taps cost 3/2 redundant
FLOPs, far cheaper than idle MXU rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_transpose_weights(w, stride: int, padding: int, dtype=jnp.bfloat16):
    """torch layout (C_in, C_out, k) -> (u*C_out, 3*C_in) phase-stacked.

    Pure jnp (trace-safe: weights arrive as jit arguments)."""
    w = jnp.asarray(w)
    c_in, c_out, k = w.shape
    u = stride
    zero = jnp.zeros((c_out, c_in), w.dtype)
    rows = []
    for r in range(u):
        row_blocks = []
        for delta in (-1, 0, 1):
            j = r + padding - delta * u
            row_blocks.append(w[:, :, j].T if 0 <= j < k else zero)
        rows.append(jnp.concatenate(row_blocks, axis=1))
    return jnp.concatenate(rows, axis=0).astype(dtype)


def _kernel(x_ref, w_ref, b_ref, out_ref, im2col, *, c_in, tt):
    x = x_ref[0]  # (C_in, Tt + 2)
    for delta in range(3):
        im2col[delta * c_in : (delta + 1) * c_in, :] = x[:, delta : delta + tt].astype(
            im2col.dtype
        )
    # bf16 operands (both already bf16-stored), f32 accumulate: identical
    # products to the former f32-cast dot, single-pass MXU instead of
    # multi-pass fp32 emulation (see ops/pallas_resblock.py)
    y = jax.lax.dot_general(
        w_ref[:],
        im2col[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (y + b_ref[:]).astype(out_ref.dtype)


def conv_transpose1d_pallas(x, w, b, *, stride: int, padding: int,
                            time_tile: int = 256, interpret: bool = False):
    """x: (B, C_in, T) -> (B, C_out, T*stride); torch conv_transpose1d
    semantics for k - 2*padding == stride (the NSF upsample family)."""
    bsz, c_in, t = x.shape
    c_out = w.shape[1]
    k = w.shape[2]
    u = stride
    assert k - 2 * padding == u, (k, padding, u)

    t_pad = (-t) % time_tile
    n_tiles = (t + t_pad) // time_tile

    w_packed = pack_transpose_weights(w, u, padding)
    # rows are ordered r*C_out + o -> bias per row = b[o]
    if b is not None:
        bias = jnp.tile(jnp.asarray(b, jnp.float32), (u,)).reshape(-1, 1)
    else:
        bias = jnp.zeros((u * c_out, 1), jnp.float32)

    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + t_pad)))
    starts = np.arange(n_tiles) * time_tile
    idx = starts[:, None] + np.arange(time_tile + 2)[None, :]
    tiles = xp[:, :, idx]  # (B, C, n_tiles, Tt+2)
    tiles = jnp.transpose(tiles, (0, 2, 1, 3)).reshape(
        bsz * n_tiles, c_in, time_tile + 2
    )

    out = pl.pallas_call(
        functools.partial(_kernel, c_in=c_in, tt=time_tile),
        grid=(bsz * n_tiles,),
        in_specs=[
            pl.BlockSpec((1, c_in, time_tile + 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, u * c_out, time_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * n_tiles, u * c_out, time_tile), x.dtype),
        scratch_shapes=[pltpu.VMEM((3 * c_in, time_tile), jnp.bfloat16)],
        interpret=interpret,
    )(tiles, w_packed, bias)

    # (B*n_tiles, u*C_out, Tt): row r*C_out+o at col m == y[o, (tile*Tt+m)*u + r]
    out = out.reshape(bsz, n_tiles, u, c_out, time_tile)
    out = jnp.transpose(out, (0, 3, 1, 4, 2))  # (B, C_out, n_tiles, Tt, u)
    out = out.reshape(bsz, c_out, (t + t_pad) * u)
    return out[:, :, : t * u]
