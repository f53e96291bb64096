"""MP3 codec boundary: ctypes lame encode -> mpg123 decode round trips.

The reference's default output format is mp3 via pydub->ffmpeg->libmp3lame
(rvc/cli/rvc_cli.py:22, rvc/scripts/audio_processing.py:37-40); here the
same system codec libraries are bound directly (utils/mp3_codec.py), so
`-f mp3` works with no ffmpeg install. Tests skip cleanly on machines
without the libraries.
"""

import numpy as np
import pytest

from polgen_rvc_tpu.utils import mp3_codec
from polgen_rvc_tpu.utils.audio_io import read_audio, write_audio

pytestmark = pytest.mark.skipif(
    not mp3_codec.available(), reason="libmp3lame/libmpg123 not present"
)


def _sine(sr, seconds, freq, stereo=False):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    if stereo:
        return np.stack([x, 0.25 * x], axis=1)
    return x


def _aligned_snr(ref, dec):
    """SNR (dB) after aligning for the encoder+decoder delay."""
    n = min(len(ref), len(dec))
    ref, dec = ref[:n], dec[:n]
    lags = np.arange(0, 4000)
    xc = [np.dot(ref[: n - lag], dec[lag : n]) for lag in lags]
    lag = int(lags[np.argmax(xc)])
    a, b = ref[: n - lag], dec[lag:n]
    cut = len(a) // 8  # skip edge transients
    a, b = a[cut:-cut], b[cut:-cut]
    g = np.dot(a, b) / max(np.dot(b, b), 1e-12)  # codec gain
    err = a - g * b
    return 10 * np.log10(np.dot(a, a) / max(np.dot(err, err), 1e-12))


@pytest.mark.parametrize("sr", [16000, 44100, 48000])
def test_mono_roundtrip(tmp_path, sr):
    x = _sine(sr, 1.0, 440.0)
    p = str(tmp_path / "m.mp3")
    mp3_codec.encode_mp3(p, x, sr)
    y, got_sr = mp3_codec.decode_mp3(p)
    assert got_sr == sr
    assert y.shape[1] == 1
    snr = _aligned_snr(x, y[:, 0])
    assert snr > 25.0, f"mono {sr} Hz round-trip SNR {snr:.1f} dB"


def test_stereo_roundtrip(tmp_path):
    sr = 48000
    x = _sine(sr, 1.0, 330.0, stereo=True)
    p = str(tmp_path / "s.mp3")
    mp3_codec.encode_mp3(p, x, sr)
    y, got_sr = mp3_codec.decode_mp3(p)
    assert got_sr == sr
    assert y.shape[1] == 2
    assert _aligned_snr(x[:, 0], y[:, 0]) > 20.0
    assert _aligned_snr(x[:, 1], y[:, 1]) > 20.0


def test_int16_input_and_header(tmp_path):
    sr = 44100
    x = (_sine(sr, 0.5, 220.0) * 32767).astype(np.int16)
    p = str(tmp_path / "i.mp3")
    mp3_codec.encode_mp3(p, x, sr)
    with open(p, "rb") as f:
        head = f.read(4)
    # frame sync (0xFFE) or ID3 tag
    assert head[:3] == b"ID3" or (head[0] == 0xFF and head[1] & 0xE0 == 0xE0)


def test_audio_io_mp3_path(tmp_path):
    """write_audio/read_audio route .mp3 through the codec bindings."""
    sr = 48000
    x = _sine(sr, 0.5, 440.0)
    p = str(tmp_path / "io.mp3")
    assert write_audio(p, x, sr) == p
    y, got_sr = read_audio(p)
    assert got_sr == sr
    assert _aligned_snr(x, y[:, 0]) > 25.0


def test_decode_garbage_raises(tmp_path):
    p = str(tmp_path / "bad.mp3")
    with open(p, "wb") as f:
        f.write(b"\x00" * 4096)
    with pytest.raises(Exception):
        mp3_codec.decode_mp3(p)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        mp3_codec.decode_mp3("/nonexistent/x.mp3")
