"""No-F0 model path, odd input shapes, and engine edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from polgen_rvc_tpu.convert.rvc_ckpt import build_config, convert_synthesizer_state
from polgen_rvc_tpu.convert.hubert_ckpt import convert_hubert_state
from polgen_rvc_tpu.convert.synthetic import make_hubert_state, make_rvc_checkpoint
from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig, VoiceConverter


@pytest.fixture(scope="module")
def nof0_converter():
    """Engine over a no-pitch-guidance model (reference f0=0 checkpoints —
    the reference's own no-f0 Generator is dead code; ours works)."""
    cpt = make_rvc_checkpoint(sr=48000, tiny=True, use_f0=False, seed=11)
    cfg = build_config(cpt["config"], use_f0=False, version="v2")
    params = convert_synthesizer_state(cpt["weight"], cfg)
    hub_cfg, hub_sd = make_hubert_state(tiny=True, seed=12)
    rng = np.random.default_rng(13)
    params["enc_p"]["emb_phone"]["w"] = (
        rng.standard_normal((hub_cfg.embed_dim, cfg.hidden_channels)) * 0.1
    ).astype(np.float32)
    return VoiceConverter(
        synth_cfg=cfg, synth_params=params,
        hubert_cfg=hub_cfg, hubert_params=convert_hubert_state(hub_sd, hub_cfg),
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
    )


def test_nof0_model_converts(nof0_converter):
    t = np.arange(32000) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out, sr = nof0_converter.convert(audio, ConversionOptions())
    assert sr == 48000 and len(out) > 0
    assert np.abs(out).max() > 0


def test_very_short_audio(nof0_converter):
    # sub-second input: single chunk, hubert minimum window respected
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(np.float32)
    out, sr = nof0_converter.convert(audio, ConversionOptions())
    assert len(out) > 0


def test_resample_sr_fallback_path():
    """resample_sr triggers the host finalize path + polyphase resample."""
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
    )
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 16000)).astype(np.float32)
    out, sr = vc.convert(audio, ConversionOptions(resample_sr=32000))
    assert sr == 32000
    assert abs(len(out) - 1.5 * 32000) < 32000 // 4


def test_resample_poly_matches_librosa_semantics_within_mel_gate():
    """Pin the output-resample choice (VERDICT r4 #9): the host finalize
    uses scipy.signal.resample_poly (pipeline/output.py) where the
    reference uses librosa.resample (/root/reference/rvc/infer/
    pipeline.py:455). librosa is not installed here; ops/resample.py IS
    the librosa-capability stand-in (Kaiser windowed-sinc polyphase, the
    same family librosa's soxr/kaiser modes implement), with its own
    parity tests. Bound scipy-vs-windowed-sinc on a full-band swept sine
    within the BASELINE 0.5 dB mel gate at the production rate pair."""
    from scipy.signal import resample_poly

    from polgen_rvc_tpu.ops.resample import resample
    from polgen_rvc_tpu.utils.metrics import mel_distortion_db

    import math as _math

    sr_in, sr_out = 48000, 44100
    g = _math.gcd(sr_in, sr_out)
    edge = 2048  # trim each filter's startup transient before comparing

    # (1) exponential sweep 100 Hz -> 18 kHz (inside the 22.05 kHz output
    # Nyquist, so both filters are in their passband): time-domain SNR.
    # The mel gate is NOT meaningful on a sweep — at any instant all but a
    # few mel bins hold only window leakage, where log() amplifies
    # differences of inaudible magnitude.
    t = np.arange(3 * sr_in) / sr_in
    f0, f1, dur = 100.0, 18000.0, 3.0
    k = np.log(f1 / f0) / dur
    sweep = (0.5 * np.sin(2 * np.pi * f0 * (np.exp(k * t) - 1) / k)).astype(
        np.float32
    )
    a = resample_poly(sweep, sr_out // g, sr_in // g).astype(np.float32)
    b = np.asarray(resample(jnp.asarray(sweep), sr_in, sr_out))
    assert abs(len(a) - len(b)) <= 1
    n = min(len(a), len(b))
    seg_a, seg_b = a[edge : n - edge], b[edge : n - edge]
    snr = 10 * np.log10(
        float(np.mean(seg_a**2)) / float(np.mean((seg_a - seg_b) ** 2))
    )
    assert snr > 55.0, f"swept-sine scipy-vs-windowed-sinc SNR {snr:.1f} dB"

    # (2) broadband noise band-limited to 18 kHz (every mel bin energized):
    # the BASELINE 0.5 dB mel gate applies directly
    rng = np.random.default_rng(5)
    noise = rng.standard_normal(3 * sr_in).astype(np.float32)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(noise.size, 1.0 / sr_in)
    spec[freqs > 18000.0] = 0.0
    noise = np.fft.irfft(spec, n=noise.size).astype(np.float32)
    a = resample_poly(noise, sr_out // g, sr_in // g).astype(np.float32)
    b = np.asarray(resample(jnp.asarray(noise), sr_in, sr_out))
    n = min(len(a), len(b))
    d = mel_distortion_db(a[edge : n - edge], b[edge : n - edge], sr_out)
    assert d < 0.5, f"scipy-vs-windowed-sinc mel distortion {d:.3f} dB"


def test_f0_file_override(tmp_path):
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
    )
    f0_path = tmp_path / "pitch.txt"
    lines = [f"{i * 0.01:.2f},{200.0 + i}" for i in range(50)]
    f0_path.write_text("\n".join(lines))
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 16000)).astype(np.float32)
    out1, _ = vc.convert(audio, ConversionOptions(seed=5))
    out2, _ = vc.convert(audio, ConversionOptions(seed=5, f0_file=str(f0_path)))
    assert np.abs(out1.astype(np.int32) - out2.astype(np.int32)).max() > 0
