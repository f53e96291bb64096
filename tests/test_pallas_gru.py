"""Pallas GRU scan vs the lax.scan implementation (interpret mode)."""

import numpy as np
import torch

import jax.numpy as jnp

from polgen_rvc_tpu.ops.pallas_gru import bigru_pallas
from polgen_rvc_tpu.ops.rnn import bigru


def test_bigru_pallas_matches_scan(rng):
    t, i, h = 70, 12, 16
    x = rng.standard_normal((1, t, i)).astype(np.float32)
    g = torch.nn.GRU(i, h, batch_first=True, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    params = {
        "w_ih_l0": sd["weight_ih_l0"], "w_hh_l0": sd["weight_hh_l0"],
        "b_ih_l0": sd["bias_ih_l0"], "b_hh_l0": sd["bias_hh_l0"],
        "w_ih_l0_reverse": sd["weight_ih_l0_reverse"],
        "w_hh_l0_reverse": sd["weight_hh_l0_reverse"],
        "b_ih_l0_reverse": sd["bias_ih_l0_reverse"],
        "b_hh_l0_reverse": sd["bias_hh_l0_reverse"],
    }
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    want = np.asarray(bigru(jnp.asarray(x), jp))
    got = np.asarray(bigru_pallas(jnp.asarray(x), jp, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # torch parity too
    ref, _ = g(torch.from_numpy(x))
    np.testing.assert_allclose(got, ref.detach().numpy(), rtol=1e-3, atol=1e-4)
