"""Phase-stacked transposed conv vs torch semantics (interpret mode)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from polgen_rvc_tpu.ops.pallas_convtranspose import conv_transpose1d_pallas


@pytest.mark.parametrize(
    "cin,cout,k,u",
    [
        (16, 8, 24, 12),  # 48k stage 1 shape family
        (16, 8, 20, 10),
        (8, 4, 4, 2),
        (6, 3, 3, 3),  # k == u (padding 0)
    ],
)
def test_matches_torch(rng, cin, cout, k, u):
    pad = (k - u) // 2
    t = 40
    x = rng.standard_normal((2, cin, t)).astype(np.float32)
    w = (rng.standard_normal((cin, cout, k)) / np.sqrt(cin * k)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=u, padding=pad,
    ).numpy()
    got = np.asarray(
        conv_transpose1d_pallas(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            stride=u, padding=pad, time_tile=16, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)
