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
