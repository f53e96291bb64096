"""Discriminator heads: shapes, periods, feature maps."""

import numpy as np

import jax.numpy as jnp

from polgen_rvc_tpu.models.discriminators import (
    PERIODS_V2,
    init_discriminator_params,
    multi_period_discriminator,
)


def test_mpd_v2_shapes(rng):
    params = init_discriminator_params(version="v2", seed=0)
    y = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.1)
    r, f, rf, ff = multi_period_discriminator(params, y, y_hat, version="v2")
    assert len(r) == len(f) == 1 + len(PERIODS_V2)  # S head + P heads
    assert len(rf) == len(ff) == 1 + len(PERIODS_V2)
    for logits in r + f:
        assert logits.ndim == 2 and logits.shape[0] == 1
        assert np.isfinite(np.asarray(logits)).all()
    # each head returns one fmap per conv + the post conv
    assert all(len(m) >= 5 for m in rf)
