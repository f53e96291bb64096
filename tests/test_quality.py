"""Numerics budget: bf16 + kernel paths must stay within the mel-distortion
acceptance band used for reference parity (<0.5 dB, BASELINE.md)."""

import numpy as np

from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter
from polgen_rvc_tpu.utils.metrics import mel_distortion_db


def _song(seconds=2.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    vib = 1 + 0.01 * np.sin(2 * np.pi * 5 * t)
    return (0.4 * np.sin(2 * np.pi * 220 * t * vib)).astype(np.float32)


def test_bf16_within_mel_budget():
    """bf16 compute vs fp32 on identical F0 inputs must stay < 0.5 dB.

    F0 is pinned so the test measures continuous-path numerics; the engine
    always runs the F0 decode itself in fp32 (argmax decisions must not
    flip with precision)."""
    eng32 = EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                         chunk_batch=1, bucket_step_s=2,
                         compute_dtype="float32")
    eng16 = EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                         chunk_batch=1, bucket_step_s=2,
                         compute_dtype="bfloat16")
    a = build_synthetic_converter(tiny=True, sr=48000, engine=eng32, seed=0)
    b = build_synthetic_converter(tiny=True, sr=48000, engine=eng16, seed=0)

    def fixed_f0(audio_pad, p_len, opts):
        f0 = np.full(p_len, 220.0, np.float32)
        from polgen_rvc_tpu.pipeline.engine import coarse_f0_np

        return coarse_f0_np(f0.copy()), f0

    a.compute_f0 = fixed_f0
    b.compute_f0 = fixed_f0
    song = _song()
    opts = ConversionOptions(seed=3)
    out32, sr = a.convert(song, opts)
    out16, _ = b.convert(song, opts)
    dist = mel_distortion_db(out32, out16, sr)
    assert dist < 0.5, f"bf16 mel distortion {dist:.3f} dB exceeds budget"


def test_identical_runs_zero_distortion():
    eng = EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                       chunk_batch=1, bucket_step_s=2)
    vc = build_synthetic_converter(tiny=True, sr=48000, engine=eng, seed=0)
    song = _song()
    o1, sr = vc.convert(song, ConversionOptions(seed=9))
    o2, _ = vc.convert(song, ConversionOptions(seed=9))
    assert mel_distortion_db(o1, o2, sr) == 0.0
