"""Pallas TPU kernel: single-core GRU scan with grid-carried state.

RMVPE's BiGRU runs over the full song's mel frames (up to ~18k steps for
3 minutes). Under lax.scan each step pays XLA while-loop overhead that
dwarfs the actual (1,256)x(256,768) recurrence math, making the F0 pass
scan-latency-bound. This kernel runs the whole scan inside one Pallas
program: the input projections (the big matmul) are hoisted outside onto
the MXU as usual; the sequential part streams x-projection blocks through
VMEM via the BlockSpec pipeline while the hidden state persists in a
scratch register across grid steps (TPU grids execute sequentially on a
core, so scratch is a legal loop carry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(xp_ref, whh_ref, bhh_ref, out_ref, h_scratch, *, chunk, hidden):
    step0 = pl.program_id(0)

    @pl.when(step0 == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    whh = whh_ref[:]  # (hidden, 3*hidden)
    bhh = bhh_ref[:]  # (1, 3*hidden)
    unroll = 8  # sublane-aligned output stores

    def block(j, h):
        base = j * unroll
        xs = xp_ref[pl.ds(base, unroll), :]  # (8, 3H) aligned load
        rows = []
        for s in range(unroll):
            x_row = xs[s][None, :]
            gh = jnp.dot(h, whh, preferred_element_type=jnp.float32) + bhh
            xr = x_row[:, :hidden]
            xz = x_row[:, hidden : 2 * hidden]
            xn = x_row[:, 2 * hidden :]
            gr = gh[:, :hidden]
            gz = gh[:, hidden : 2 * hidden]
            gn = gh[:, 2 * hidden :]
            r = jax.nn.sigmoid(xr + gr)
            z = jax.nn.sigmoid(xz + gz)
            n = jnp.tanh(xn + r * gn)
            h = (1.0 - z) * n + z * h
            rows.append(h)
        out_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, axis=0)
        return h

    h = jax.lax.fori_loop(0, chunk // unroll, block, h_scratch[:])
    h_scratch[:] = h


def gru_scan_pallas(x_proj, w_hh, b_hh, *, chunk: int = 512, interpret: bool = False):
    """Sequential GRU over precomputed input projections.

    x_proj: (T, 3H) = x @ w_ih^T + b_ih  (torch gate order r,z,n)
    w_hh:   (3H, H) torch layout; b_hh: (3H,)
    Returns hidden states (T, H) fp32. T is padded to a chunk multiple
    internally (zeros) and trimmed.
    """
    t, three_h = x_proj.shape
    hidden = three_h // 3
    pad = (-t) % chunk
    xp = jnp.pad(x_proj.astype(jnp.float32), ((0, pad), (0, 0)))
    n_chunks = xp.shape[0] // chunk

    whh_t = jnp.asarray(w_hh, jnp.float32).T  # (H, 3H): h @ whh_t
    bhh = jnp.asarray(b_hh, jnp.float32)[None, :]

    out = pl.pallas_call(
        functools.partial(_gru_kernel, chunk=chunk, hidden=hidden),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, three_h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, hidden), jnp.float32)],
        interpret=interpret,
    )(xp, whh_t, bhh)
    return out[:t]


def bigru_pallas(x, params: dict, *, interpret: bool = False):
    """Bidirectional GRU with the ops.rnn.bigru contract: (B, T, I) ->
    (B, T, 2H), torch weight layout. B must be 1 (the F0 path's shape)."""
    b, t, _ = x.shape
    assert b == 1, "pallas GRU path is written for the B=1 F0 pass"
    x32 = x[0].astype(jnp.float32)

    def run(direction):
        sfx = "" if direction == "fwd" else "_reverse"
        w_ih = jnp.asarray(params[f"w_ih_l0{sfx}"], jnp.float32)
        b_ih = jnp.asarray(params[f"b_ih_l0{sfx}"], jnp.float32)
        xin = x32 if direction == "fwd" else x32[::-1]
        xp = xin @ w_ih.T + b_ih  # MXU
        hs = gru_scan_pallas(
            xp, params[f"w_hh_l0{sfx}"], params[f"b_hh_l0{sfx}"],
            interpret=interpret,
        )
        return hs if direction == "fwd" else hs[::-1]

    fwd = run("fwd")
    bwd = run("bwd")
    return jnp.concatenate([fwd, bwd], axis=-1)[None]
