"""RMVPE: BN-folding correctness, U-Net shapes, end-to-end F0 sanity."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from polgen_rvc_tpu.convert.rmvpe_ckpt import convert_rmvpe_state
from polgen_rvc_tpu.convert.synthetic import make_rmvpe_state
from polgen_rvc_tpu.models.rmvpe import (
    pad_frames_to_32,
    rmvpe_f0,
    rmvpe_mel,
    rmvpe_salience,
)


@pytest.fixture(scope="module")
def params():
    return convert_rmvpe_state(make_rmvpe_state(seed=0))


def test_bn_fold_matches_torch(rng):
    """conv(bias-free) + eval BatchNorm == folded conv."""
    from polgen_rvc_tpu.convert.common import fold_batch_norm_into_conv

    conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_(1.0, 0.1); bn.bias.data.normal_(0.0, 0.1)
    conv.eval(); bn.eval()
    x = torch.from_numpy(rng.standard_normal((2, 4, 6, 6)).astype(np.float32))
    with torch.no_grad():
        ref = bn(conv(x)).numpy()

    sd = {
        "bn.weight": bn.weight.detach().numpy(),
        "bn.bias": bn.bias.detach().numpy(),
        "bn.running_mean": bn.running_mean.numpy(),
        "bn.running_var": bn.running_var.numpy(),
    }
    w, b = fold_batch_norm_into_conv(conv.weight.detach().numpy(), sd, "bn")
    with torch.no_grad():
        got = torch.nn.functional.conv2d(
            x, torch.from_numpy(w), torch.from_numpy(b), padding=1
        ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_rmvpe_salience_shape(params, rng):
    mel = rng.standard_normal((1, 128, 64)).astype(np.float32)
    sal = np.asarray(rmvpe_salience(params, jnp.asarray(mel)))
    assert sal.shape == (1, 64, 360)
    assert np.all((sal >= 0) & (sal <= 1))


def test_pad_frames_to_32():
    mel = jnp.ones((1, 128, 33))
    padded, n = pad_frames_to_32(mel)
    assert n == 33 and padded.shape[-1] == 64
    mel2 = jnp.ones((1, 128, 64))
    padded2, n2 = pad_frames_to_32(mel2)
    assert n2 == 64 and padded2.shape[-1] == 64


def test_rmvpe_f0_end_to_end(params):
    sr = 16000
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)[None]
    f0 = np.asarray(rmvpe_f0(params, jnp.asarray(audio), f0_min=50, f0_max=1100))
    assert f0.shape == (1, sr // 160 + 1)
    # synthetic weights -> arbitrary salience, but decode must stay in range
    assert np.all((f0 == 0) | ((f0 >= 50) & (f0 <= 1100)))
    assert np.all(np.isfinite(f0))


def test_rmvpe_mel_frame_count():
    audio = jnp.zeros((1, 16000))
    mel = rmvpe_mel(audio)
    assert mel.shape == (1, 128, 16000 // 160 + 1)
