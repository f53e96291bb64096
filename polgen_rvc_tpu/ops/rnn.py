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
    """
    fwd = gru(
        x,
        params["w_ih_l0"],
        params["w_hh_l0"],
        params.get("b_ih_l0"),
        params.get("b_hh_l0"),
    )
    bwd = gru(
        x,
        params["w_ih_l0_reverse"],
        params["w_hh_l0_reverse"],
        params.get("b_ih_l0_reverse"),
        params.get("b_hh_l0_reverse"),
        reverse=True,
    )
    return jnp.concatenate([fwd, bwd], axis=-1)
