"""GRU as a lax.scan with torch gate order — RMVPE's BiGRU on TPU.

torch.nn.GRU packs gates as (reset, update, new) in both weight matrices
(w_ih: (3H, I), w_hh: (3H, H)). The input projection for ALL timesteps is
hoisted out of the scan into one big MXU matmul; only the (B,H)x(H,3H)
recurrence stays sequential (SURVEY.md hard-part #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru(
    x,
    w_ih,
    w_hh,
    b_ih=None,
    b_hh=None,
    h0=None,
    *,
    reverse: bool = False,
):
    """Single-layer unidirectional GRU.

    x: (B, T, I); returns (B, T, H) hidden states (torch GRU output).
    """
    b, t, _ = x.shape
    hdim = w_hh.shape[1]
    dtype = x.dtype
    w_ih = w_ih.astype(dtype)
    w_hh = w_hh.astype(dtype)

    # One large matmul for the input projections of every timestep (MXU).
    x_proj = jnp.einsum("bti,gi->btg", x, w_ih)
    if b_ih is not None:
        x_proj = x_proj + b_ih.astype(dtype)
    x_r, x_z, x_n = jnp.split(x_proj, 3, axis=-1)

    w_hr, w_hz, w_hn = jnp.split(w_hh, 3, axis=0)
    if b_hh is not None:
        b_hr, b_hz, b_hn = jnp.split(b_hh.astype(dtype), 3)
    else:
        b_hr = b_hz = b_hn = jnp.zeros((hdim,), dtype)

    if h0 is None:
        h0 = jnp.zeros((b, hdim), dtype)

    def step(h, inputs):
        xr, xz, xn = inputs
        r = jax.nn.sigmoid(xr + h @ w_hr.T + b_hr)
        z = jax.nn.sigmoid(xz + h @ w_hz.T + b_hz)
        n = jnp.tanh(xn + r * (h @ w_hn.T + b_hn))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = (
        jnp.swapaxes(x_r, 0, 1),
        jnp.swapaxes(x_z, 0, 1),
        jnp.swapaxes(x_n, 0, 1),
    )
    _, hs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def bigru(x, params: dict):
    """Bidirectional single-layer GRU; concat(fwd, bwd) on features.

    params holds torch-layout tensors: w_ih_l0, w_hh_l0, b_ih_l0, b_hh_l0 and
    the *_reverse counterparts. Matches torch.nn.GRU(bidirectional=True)
    used at /root/reference/rvc/lib/predictors/RMVPE.py:125-137.

    Scan-latency layout for TPU: the two directions run as one scan (the
    backward stream rides with its input time-flipped) and the three
    recurrence matmuls fuse into a single (2, B, H) x (2, H, 3H) batched
    matmul per step — one sequential chain of length T instead of two, with
    one MXU dispatch per step instead of three. Gate math is unchanged.
    """
    b, t, _ = x.shape
    dtype = x.dtype
    hdim = params["w_hh_l0"].shape[1]

    def prep(suffix, xs):
        w_ih = params[f"w_ih_l0{suffix}"].astype(dtype)
        xp = jnp.einsum("bti,gi->btg", xs, w_ih)
        b_ih = params.get(f"b_ih_l0{suffix}")
        if b_ih is not None:
            xp = xp + b_ih.astype(dtype)
        return xp

    # (2, B, T, 3H): direction-major input projections, backward flipped
    x_proj = jnp.stack([prep("", x), prep("_reverse", x[:, ::-1])])
    # (2, H, 3H) recurrence weights, transposed for h @ w
    w_hh = jnp.stack(
        [params["w_hh_l0"].astype(dtype).T,
         params["w_hh_l0_reverse"].astype(dtype).T]
    )
    b_hh = jnp.stack(
        [params["b_hh_l0"].astype(dtype), params["b_hh_l0_reverse"].astype(dtype)]
    ) if params.get("b_hh_l0") is not None else jnp.zeros((2, 3 * hdim), dtype)

    def step(h, xp_t):
        # h: (2, B, H); xp_t: (2, B, 3H)
        hg = jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh[:, None, :]
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, b, hdim), dtype)
    # unroll amortizes the per-step scan overhead (the chain is ~18k steps
    # at bench shapes and latency-bound, not FLOP-bound)
    _, hs = jax.lax.scan(step, h0, jnp.moveaxis(x_proj, 2, 0), unroll=8)
    fwd = jnp.moveaxis(hs[:, 0], 0, 1)           # (B, T, H)
    bwd = jnp.moveaxis(hs[:, 1], 0, 1)[:, ::-1]  # un-flip
    return jnp.concatenate([fwd, bwd], axis=-1)
