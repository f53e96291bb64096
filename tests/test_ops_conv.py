"""Parity of conv ops vs torch CPU (generic torch functional ops only)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from polgen_rvc_tpu.ops import conv1d, conv2d, conv_transpose1d, conv_transpose2d


def _np(t):
    return t.detach().numpy()


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (4, 8, 3, 1, 1, 1, 1),
        (6, 6, 5, 1, 2, 1, 1),
        (8, 8, 3, 1, 3, 3, 1),  # dilated (WaveNet style)
        (8, 16, 10, 5, 0, 1, 1),  # HuBERT front conv
        (12, 12, 7, 1, 3, 1, 1),
        (8, 8, 4, 2, 1, 1, 8),  # depthwise
        (16, 16, 128, 1, 64, 1, 16),  # HuBERT pos-conv style (grouped)
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, dil, groups):
    x = rng.standard_normal((2, cin, 50)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dil, groups=groups,
    )
    got = conv1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=stride, padding=pad, dilation=dil, groups=groups,
    )
    np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,outpad",
    [
        (8, 4, 16, 8, 4, 0),
        (16, 8, 20, 10, 5, 0),
        (16, 8, 4, 2, 1, 0),
        (6, 3, 5, 3, 1, 1),
        (8, 8, 24, 12, 6, 0),  # 48k RVC first upsample
    ],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, k, stride, pad, outpad):
    x = rng.standard_normal((2, cin, 30)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=outpad,
    )
    got = conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=stride, padding=pad, output_padding=outpad,
    )
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [
        (3, 8, (3, 3), (1, 1), (1, 1)),
        (8, 16, (3, 3), (2, 2), (1, 1)),
        (4, 4, (1, 1), (1, 1), (0, 0)),
    ],
)
def test_conv2d_matches_torch(rng, cin, cout, k, stride, pad):
    x = rng.standard_normal((2, cin, 16, 12)).astype(np.float32)
    w = rng.standard_normal((cout, cin, *k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad,
    )
    got = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "stride,outpad",
    [((2, 2), (1, 1)), ((1, 2), (0, 1))],  # RMVPE decoder variants
)
def test_conv_transpose2d_matches_torch(rng, stride, outpad):
    x = rng.standard_normal((2, 8, 10, 6)).astype(np.float32)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), None,
        stride=stride, padding=(1, 1), output_padding=outpad,
    )
    got = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), None,
        stride=stride, padding=(1, 1), output_padding=outpad,
    )
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-4, atol=1e-4)
