"""Flash kernel for the VITS windowed relative-position attention.

One streaming-softmax Pallas kernel computes the COMPLETE attention of
reference attentions.py:60-163 — content scores, the ±w relative-key
logit band, masked softmax, the value contraction AND the relative-value
band term — without ever materializing a (T, T) array in HBM:

  scores[t, s] = q[t]·k[s]·scale + (q[t]·scale)·rel_k[s - t + w]   (|s-t|<=w)
  p            = softmax_s(scores masked to s < length)
  out[t]       = sum_s p[t, s]·v[s] + sum_d p[t, t+d]·rel_v[d + w]

The rel tables enter the kernel as (128, dk) constants; the band bias and
the band-probability row sums are generated on the fly only for the ~2
diagonal tile pairs each query block actually crosses (`lax.cond` on the
block indices), so the extra work is O(T·w), not O(T^2). The earlier
design materialized the dense bias for jax's stock flash kernel, which
made it HBM-bound and only ~10% faster than the banded XLA path; this
kernel replaces it.

Masking: the engine's chunk masks are contiguous prefixes, so validity is
a per-row `length`; key blocks entirely past `length` are skipped (their
softmax contribution is exactly zero), which also short-circuits packed
batches whose rows hold short chunks. Rows at t >= length compute
garbage-but-finite values and are masked downstream, exactly like the
banded path (scores there are filled with -1e4, not removed).

Parity: interpret-mode tests vs relative_attention on CPU
(tests/test_flash_relattn.py) + on-device check in
tools/validate_flash_attention.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import conv1d

_NEG = -1e30


def _kernel(len_ref, q_ref, k_ref, v_ref, relk_ref, relv_ref,
            out_ref, acc, m_sc, l_sc, *, bq, bk, w, nk):
    kj = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc[:] = jnp.zeros_like(acc)

    length = len_ref[pl.program_id(0)]

    @pl.when(kj * bk < length)
    def _():
        q = q_ref[0]  # (bq, dpad), already scaled by 1/sqrt(dk)
        k = k_ref[0]  # (bk, dpad)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)

        row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        col = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        d = col - row + w  # band coordinate, valid in [0, 2w+1)

        # does the ±w band cross this (qi, kj) tile pair at all?
        band_hits = (kj * bk < qi * bq + bq + w) & (qi * bq < kj * bk + bk + w)

        def add_band_bias(s):
            # (bq, 128) rel-key logits: column r is the logit at offset r-w
            qrel = jax.lax.dot_general(
                q, relk_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = jnp.zeros((bq, bk), jnp.float32)
            for r in range(2 * w + 1):
                bias += jnp.where(d == r, qrel[:, r : r + 1], 0.0)
            return s + bias

        s = jax.lax.cond(band_hits, add_band_bias, lambda s: s, s)
        s = jnp.where(col < length, s, _NEG)

        m_prev = m_sc[:, :1]
        l_prev = l_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_sc[:] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_sc.shape
        )
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

        upd = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def add_rel_value(upd):
            # band-probability row sums: pb[t, r] = sum_s p[t, s]·[d == r]
            cols = [
                jnp.sum(jnp.where(d == r, p, 0.0), axis=1, keepdims=True)
                for r in range(2 * w + 1)
            ]
            pb = jnp.concatenate(
                cols + [jnp.zeros((bq, 128 - (2 * w + 1)), jnp.float32)], axis=1
            )
            return upd + jax.lax.dot_general(
                pb, relv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        upd = jax.lax.cond(band_hits, add_rel_value, lambda u: u, upd)
        acc[:] = acc[:] * alpha + upd

    @pl.when(kj == nk - 1)
    def _():
        l = jnp.maximum(l_sc[:, :1], 1e-30)
        out_ref[0] = (acc[:] / l).astype(out_ref.dtype)


def flash_band_attention(q, k, v, rel_k, rel_v, lengths, *, window_size: int,
                         block_q: int = 512, block_k: int = 512,
                         interpret: bool = False):
    """(BH, T, dpad) q/k/v (q pre-scaled), (128, dpad) rel tables (first
    2w+1 rows used), (BH,) int32 valid lengths -> (BH, T, dpad).

    T must be a multiple of the block sizes and dpad a multiple of 128
    (relative_attention_flash pads); rows at t >= length are garbage."""
    bh, t, dpad = q.shape
    bq = min(block_q, t)
    bk = min(block_k, t)
    assert t % bq == 0 and t % bk == 0 and dpad % 128 == 0
    nk = t // bk
    kernel = functools.partial(
        _kernel, bq=bq, bk=bk, w=window_size, nk=nk
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, t // bq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths, whole (BH,)
            pl.BlockSpec((1, bq, dpad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, dpad), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, dpad), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dpad), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, dpad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, dpad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lengths, q, k, v, rel_k, rel_v)


def relative_attention_flash(x, params, *, n_heads: int, window_size: int,
                             frame_mask=None, interpret: bool = False):
    """Drop-in for models.synthesizer.relative_attention on (B, C, T).

    frame_mask: (B, 1, T) contiguous-prefix validity mask (None = all
    valid). Output at masked frames is unspecified, as in the banded path.
    """
    b, c, t = x.shape
    dk = c // n_heads
    w = window_size
    scale = 1.0 / math.sqrt(dk)

    q = conv1d(x, params["q"]["w"], params["q"]["b"])
    k = conv1d(x, params["k"]["w"], params["k"]["b"])
    v = conv1d(x, params["v"]["w"], params["v"]["b"])

    def split_heads(y):  # (B, C, T) -> (B*H, T, dk)
        return y.reshape(b, n_heads, dk, t).swapaxes(2, 3).reshape(
            b * n_heads, t, dk
        )

    q = split_heads(q) * jnp.asarray(scale, x.dtype)
    k, v = split_heads(k), split_heads(v)

    dpad = ((dk + 127) // 128) * 128
    blk = min(512, ((t + 127) // 128) * 128)
    t_pad = (-t) % blk

    def pad_qkv(y):
        return jnp.pad(y, ((0, 0), (0, t_pad), (0, dpad - dk)))

    def pad_rel(table):  # (1, 2w+1, dk) -> (128, dpad)
        return jnp.pad(
            table[0], ((0, 128 - (2 * w + 1)), (0, dpad - dk))
        ).astype(x.dtype)

    if frame_mask is not None:
        lengths = jnp.maximum(
            jnp.sum(frame_mask[:, 0, :] > 0, axis=-1).astype(jnp.int32), 1
        )
    else:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = jnp.repeat(lengths, n_heads)  # (B*H,)

    out = flash_band_attention(
        pad_qkv(q), pad_qkv(k), pad_qkv(v),
        pad_rel(params["emb_rel_k"]), pad_rel(params["emb_rel_v"]),
        lengths, window_size=w, block_q=blk, block_k=blk,
        interpret=interpret,
    )
    out = out[:, :t, :dk]
    out = out.reshape(b, n_heads, t, dk).swapaxes(2, 3).reshape(b, c, t)
    return conv1d(out, params["o"]["w"], params["o"]["b"])
