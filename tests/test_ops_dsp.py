"""Resampling, IIR filtering, RMS envelope, F0 utils."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy import signal as sps

import jax.numpy as jnp

from polgen_rvc_tpu.ops import (
    butter_highpass,
    coarse_f0,
    filtfilt_jax,
    highpass_filtfilt,
    local_average_cents,
    pitch_shift,
    resample,
    salience_to_f0,
)


@pytest.mark.parametrize("orig,target", [(44100, 16000), (48000, 16000), (16000, 48000), (40000, 16000)])
def test_resample_preserves_sine(orig, target):
    t = np.arange(orig) / orig  # 1 second
    freq = 440.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = np.asarray(resample(x, orig, target))
    assert abs(y.shape[-1] - target) <= 1
    # compare against an ideal sine at the new rate, away from edges
    t2 = np.arange(y.shape[-1]) / target
    ref = np.sin(2 * np.pi * freq * t2)
    m = slice(target // 10, -target // 10)
    err = np.max(np.abs(y[m] - ref[m]))
    assert err < 5e-3, err


def test_resample_removes_aliasing():
    # a 7.5 kHz tone cannot survive 16k downsample from 48k band-limiting to 8k
    orig, target = 48000, 16000
    t = np.arange(orig) / orig
    x = np.sin(2 * np.pi * 7900.0 * t).astype(np.float32)
    y = np.asarray(resample(x, orig, target))
    assert np.max(np.abs(y[1000:-1000])) < 1.2  # passband tone survives (7.9k < 8k)
    x2 = np.sin(2 * np.pi * 9000.0 * t).astype(np.float32)  # above new nyquist
    y2 = np.asarray(resample(x2, orig, target))
    assert np.max(np.abs(y2[1000:-1000])) < 0.02


def test_filtfilt_pad_quant_fused_matches_steps(rng):
    """The fused C++ head (filter+pad+quantize) must be BIT-identical to
    the python steps — the engine mixes both paths across convert /
    convert_batch and their outputs are compared exactly."""
    from polgen_rvc_tpu.ops.filters import highpass_filtfilt_pad_quant

    x = (rng.standard_normal(50000) * 0.4).astype(np.float64)
    t_pad, bucket = 16000, 163840
    fused = highpass_filtfilt_pad_quant(x, t_pad, bucket)
    if fused is None:
        import pytest as _pytest

        _pytest.skip("native toolchain unavailable")
    f32, q, inv = fused

    audio = highpass_filtfilt(x).astype(np.float32)
    np.testing.assert_array_equal(f32, audio)
    padded = np.pad(audio, (t_pad, t_pad), mode="reflect").astype(np.float32)
    amax = float(np.max(np.abs(padded)))
    scale = 32767.0 / amax
    q_ref = np.zeros(bucket, np.int16)
    q_ref[: len(padded)] = np.round(padded * scale)
    np.testing.assert_array_equal(q, q_ref)
    assert inv == np.float32(1.0 / scale)


def test_filtfilt_matches_scipy(rng):
    b, a = butter_highpass()
    x = rng.standard_normal(4000).astype(np.float64)
    ref = sps.filtfilt(b, a, x)
    ref2 = highpass_filtfilt(x)
    np.testing.assert_allclose(ref2, ref)
    # jax SOS path: same transfer function, fp32 state -> audio-level parity
    got = np.asarray(filtfilt_jax(jnp.asarray(x, jnp.float32), b, a))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_change_rms_np_matches_torch_reference(rng):
    """The production host mirror of AudioProcessor.change_rms
    (pipeline/engine.py change_rms_np — the oracle the device gain graphs
    are equality-tested against in test_pipeline) vs the reference's
    torch/librosa semantics recomputed literally."""
    from polgen_rvc_tpu.pipeline.engine import change_rms_np

    sr_s, sr_t = 16000, 32000
    src = rng.standard_normal(sr_s).astype(np.float32) * 0.5
    tgt = rng.standard_normal(sr_t).astype(np.float32) * 0.1

    # reference semantics recomputed with torch (as the reference does)
    def librosa_rms(y, frame_length, hop_length):
        ypad = np.pad(y, frame_length // 2)
        n = 1 + len(y) // hop_length
        out = np.empty(n, np.float32)
        for i in range(n):
            fr = ypad[i * hop_length : i * hop_length + frame_length]
            out[i] = np.sqrt(np.mean(fr**2))
        return out

    rate = 0.25
    rms_ref = librosa_rms(src, sr_s // 2 * 2, sr_s // 2)
    rms1 = F.interpolate(torch.from_numpy(rms_ref)[None, None], size=len(tgt), mode="linear").squeeze()
    rms2_ref = librosa_rms(tgt, sr_t // 2 * 2, sr_t // 2)
    rms2 = F.interpolate(torch.from_numpy(rms2_ref)[None, None], size=len(tgt), mode="linear").squeeze()
    rms2 = torch.maximum(rms2, torch.zeros_like(rms2) + 1e-6)
    ref_out = torch.from_numpy(tgt) * (
        torch.pow(rms1, 1 - rate) * torch.pow(rms2, rate - 1)
    )
    got_out = change_rms_np(src, sr_s, tgt.copy(), sr_t, rate)
    np.testing.assert_allclose(got_out, ref_out.numpy(), rtol=1e-4, atol=1e-5)


def test_coarse_f0_matches_reference_math():
    f0 = np.array([0.0, 49.0, 50.0, 123.4, 440.0, 1100.0, 2000.0], np.float32)
    f0_min, f0_max = 50.0, 1100.0
    # reference numpy math (pipeline.py:193-201)
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_mel = 1127 * np.log(1 + f0 / 700)
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - f0_mel_min) * 254 / (
        f0_mel_max - f0_mel_min
    ) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > 255] = 255
    ref = np.rint(f0_mel).astype(int)
    got = np.asarray(coarse_f0(jnp.asarray(f0), f0_min, f0_max))
    np.testing.assert_array_equal(got, ref)


def test_pitch_shift_semitones():
    np.testing.assert_allclose(
        np.asarray(pitch_shift(jnp.asarray([220.0]), 12.0)), [440.0], rtol=1e-6
    )


def test_local_average_cents_matches_reference(rng):
    # reference decode loop (RMVPE.py:498-516), re-run in pure numpy
    t, bins = 17, 360
    salience = rng.random((t, bins)).astype(np.float32) ** 4
    cents_mapping = np.pad(20 * np.arange(360) + 1997.3794084376191, (4, 4))

    def ref_decode(sal, thred):
        center = np.argmax(sal, axis=1)
        sal_p = np.pad(sal, ((0, 0), (4, 4)))
        center = center + 4
        starts, ends = center - 4, center + 5
        todo_s, todo_c = [], []
        for idx in range(sal_p.shape[0]):
            todo_s.append(sal_p[:, starts[idx] : ends[idx]][idx])
            todo_c.append(cents_mapping[starts[idx] : ends[idx]])
        todo_s, todo_c = np.array(todo_s), np.array(todo_c)
        divided = np.sum(todo_s * todo_c, 1) / np.sum(todo_s, 1)
        maxx = np.max(sal_p, axis=1)
        divided[maxx <= thred] = 0
        return divided

    ref = ref_decode(salience, 0.03)
    got = np.asarray(local_average_cents(jnp.asarray(salience), 0.03))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    # full f0 decode with range gating
    f0 = np.asarray(salience_to_f0(jnp.asarray(salience), 0.03, 50.0, 1100.0))
    assert np.all((f0 == 0) | ((f0 >= 50.0) & (f0 <= 1100.0)))
