"""Interpret-mode parity: flash rel-attention kernel vs the banded XLA path.

The flash kernel (ops/flash_relattn.py) must reproduce
models.synthesizer.relative_attention — the reference semantics of
attentions.py:60-163 — including the ±w relative key/value band terms and
contiguous-prefix masking. CPU runs the kernel through the Pallas
interpreter; tools/validate_flash_attention.py repeats this on real TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polgen_rvc_tpu.models.synthesizer import relative_attention
from polgen_rvc_tpu.ops.flash_relattn import relative_attention_flash


def _make_params(rng, c, dk, w):
    def mat():
        return jnp.asarray(
            rng.standard_normal((c, c, 1)) / np.sqrt(c), jnp.float32
        )

    return {
        "q": {"w": mat(), "b": jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32)},
        "k": {"w": mat(), "b": jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32)},
        "v": {"w": mat(), "b": jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32)},
        "o": {"w": mat(), "b": jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32)},
        "emb_rel_k": jnp.asarray(
            rng.standard_normal((1, 2 * w + 1, dk)) * dk**-0.5, jnp.float32
        ),
        "emb_rel_v": jnp.asarray(
            rng.standard_normal((1, 2 * w + 1, dk)) * dk**-0.5, jnp.float32
        ),
    }


@pytest.mark.parametrize(
    "b,t,lengths",
    [
        (1, 300, None),          # single tile, unmasked
        (2, 700, (700, 700)),    # multi-tile, full lengths
        (2, 700, (650, 97)),     # prefix masks, one row much shorter
        (1, 1100, (1025,)),      # band crosses a tile boundary
    ],
)
def test_flash_matches_banded(b, t, lengths):
    rng = np.random.default_rng(0)
    c, heads, w = 192, 2, 10
    dk = c // heads
    x = jnp.asarray(rng.standard_normal((b, c, t)) * 0.3, jnp.float32)
    params = _make_params(rng, c, dk, w)

    if lengths is None:
        mask1d = jnp.ones((b, 1, t), jnp.float32)
    else:
        mask1d = jnp.asarray(
            (np.arange(t)[None, None, :] < np.asarray(lengths)[:, None, None])
            .astype(np.float32)
        )
    attn_mask = mask1d[:, :, None, :] * mask1d[:, :, :, None]

    ref = np.asarray(
        relative_attention(
            x, params, n_heads=heads, window_size=w, attn_mask=attn_mask
        )
    )
    got = np.asarray(
        relative_attention_flash(
            x, params, n_heads=heads, window_size=w, frame_mask=mask1d,
            interpret=True,
        )
    )
    valid = np.asarray(mask1d[:, 0]).astype(bool)  # (B, T)
    for bi in range(b):
        d = np.abs(ref[bi][:, valid[bi]] - got[bi][:, valid[bi]])
        assert d.max() < 2e-4, f"row {bi}: max diff {d.max()}"


def test_flash_no_mask_matches():
    rng = np.random.default_rng(1)
    b, c, t, heads, w = 2, 192, 513, 2, 10
    dk = c // heads
    x = jnp.asarray(rng.standard_normal((b, c, t)) * 0.3, jnp.float32)
    params = _make_params(rng, c, dk, w)
    ref = np.asarray(
        relative_attention(x, params, n_heads=heads, window_size=w)
    )
    got = np.asarray(
        relative_attention_flash(
            x, params, n_heads=heads, window_size=w, interpret=True
        )
    )
    assert np.abs(ref - got).max() < 2e-4
