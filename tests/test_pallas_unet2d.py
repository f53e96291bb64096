"""W-folded fused ConvBlockRes chain kernel vs the XLA path (interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from polgen_rvc_tpu.models.rmvpe import _block_chain
from polgen_rvc_tpu.ops.pallas_unet2d import fused_convblock_chain_folded


def _mk_blocks(rng, c_in, c_out, n_blocks):
    blocks = []
    for b in range(n_blocks):
        ci = c_in if b == 0 else c_out
        blk = {
            "conv1": {
                "w": (rng.standard_normal((c_out, ci, 3, 3))
                      / np.sqrt(ci * 9)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            },
            "conv2": {
                "w": (rng.standard_normal((c_out, c_out, 3, 3))
                      / np.sqrt(c_out * 9)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            },
        }
        if ci != c_out:
            blk["shortcut"] = {
                "w": (rng.standard_normal((c_out, ci, 1, 1))
                      / np.sqrt(ci)).astype(np.float32),
                "b": (rng.standard_normal(c_out) * 0.05).astype(np.float32),
            }
        blocks.append(blk)
    return blocks


@pytest.mark.parametrize(
    "c_in,c_out,w,fold,n_blocks",
    [
        (4, 8, 8, 2, 2),    # channel-changing first block (shortcut)
        (8, 8, 16, 4, 3),   # channel-preserving chain, deeper fold
        (6, 6, 8, 1, 2),    # fold=1 degenerate (pure chain fusion)
    ],
)
def test_folded_chain_matches_xla(rng, c_in, c_out, w, fold, n_blocks):
    blocks = _mk_blocks(rng, c_in, c_out, n_blocks)
    # pre-round weights to bf16 (what the kernel stores) so the XLA
    # reference computes on identical values — isolates kernel logic from
    # weight quantization
    blocks = [
        {k: {"w": np.asarray(jnp.asarray(v["w"], jnp.bfloat16), np.float32),
             "b": v["b"]}
         for k, v in blk.items()}
        for blk in blocks
    ]
    t = 40
    x = (rng.standard_normal((1, c_in, t, w)) * 0.5).astype(np.float32)

    ref = np.asarray(
        _block_chain(jnp.asarray(x), [
            {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
             for k, v in blk.items()} for blk in blocks
        ])
    )
    got = np.asarray(
        fused_convblock_chain_folded(
            jnp.asarray(x), blocks, fold=fold, time_tile=16, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
