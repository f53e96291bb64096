"""Fused ConvBlockRes chain kernel vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from polgen_rvc_tpu.models.rmvpe import _conv_block_res
from polgen_rvc_tpu.ops.pallas_unet import fused_convblock_chain


def _mk_blocks(rng, chans):
    blocks = []
    for c_in, c_out in chans:
        blk = {
            "conv1": {
                "w": (rng.standard_normal((c_out, c_in, 3, 3)) / np.sqrt(9 * c_in)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            },
            "conv2": {
                "w": (rng.standard_normal((c_out, c_out, 3, 3)) / np.sqrt(9 * c_out)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            },
        }
        if c_in != c_out:
            blk["shortcut"] = {
                "w": (rng.standard_normal((c_out, c_in, 1, 1)) / np.sqrt(c_in)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            }
        blocks.append(blk)
    return blocks


@pytest.mark.parametrize(
    "chans,t,w",
    [
        ([(1, 16), (16, 16), (16, 16), (16, 16)], 96, 128),  # encoder stage 1
        ([(32, 64), (64, 64)], 100, 32),                     # partial chain
    ],
)
def test_chain_matches_xla(rng, chans, t, w):
    blocks = _mk_blocks(rng, chans)
    x = (rng.standard_normal((1, chans[0][0], t, w)) * 0.5).astype(np.float32)

    ref = jnp.asarray(x)
    for blk in blocks:
        ref = _conv_block_res(ref, blk)
    ref = np.asarray(ref)

    got = np.asarray(
        fused_convblock_chain(jnp.asarray(x), blocks, time_tile=32, interpret=True)
    )
    assert got.shape == ref.shape
    # bf16 im2col activations (the reference's is_half mode runs fp16)
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=3e-2)
    err = np.abs(got - ref)
    assert err.mean() < 3e-3, err.mean()
