"""Edge-TTS voice-over pipeline: text -> speech -> voice conversion.

Capability parity with /root/reference/rvc/scripts/edge_tts_conversion.py:
synthesize with a Microsoft Edge neural voice, convert to stereo, then the
same conversion stack; returns (converted path, raw TTS path)."""

from __future__ import annotations

import os
from typing import Optional

from ..utils.audio_io import save_stereo_wav
from ..utils.progress import NULL_PROGRESS, ProgressReporter
from .voice_conversion import OUTPUT_DIR, voice_pipeline


def text_to_speech(text: str, voice: str, output_path: str) -> str:
    from .edge_tts_client import synthesize

    return synthesize(text, voice, output_path)


def edge_tts_pipeline(
    text: str,
    voice_model: str,
    voice: str,
    pitch: float,
    index_rate: float = 0.5,
    filter_radius: int = 3,
    volume_envelope: float = 0.25,
    f0_method: str = "rmvpe+",
    hop_length: int = 128,
    protect: float = 0.33,
    output_format: str = "mp3",
    f0_min: float = 50,
    f0_max: float = 1100,
    *,
    output_dir: Optional[str] = None,
    progress: ProgressReporter = NULL_PROGRESS,
) -> tuple[str, str]:
    """Reference edge_tts_pipeline (edge_tts_conversion.py:112-168)."""
    if not text:
        raise ValueError("enter the text to synthesize")
    if not voice:
        raise ValueError("select a language and voice for speech synthesis")
    if not voice_model:
        raise ValueError("select a voice model for conversion")

    out_dir = output_dir or OUTPUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    tts_path = os.path.join(out_dir, "TTS_Voice.mp3")
    tts_stereo_path = os.path.join(out_dir, "TTS_Voice_Stereo.wav")
    convert_path = os.path.join(out_dir, f"TTS_Voice_Converted.{output_format}")
    if os.path.exists(convert_path):
        os.remove(convert_path)

    progress(0.2, "synthesizing speech (Edge TTS)")
    text_to_speech(text, voice, tts_path)

    progress(0.4, "converting to stereo")
    save_stereo_wav(tts_path, tts_stereo_path)

    progress(0.6, "converting voice")
    converted = voice_pipeline(
        tts_stereo_path,
        voice_model,
        pitch,
        index_rate=index_rate,
        filter_radius=filter_radius,
        volume_envelope=volume_envelope,
        f0_method=f0_method,
        hop_length=hop_length,
        protect=protect,
        output_format=output_format,
        f0_min=f0_min,
        f0_max=f0_max,
        output_dir=out_dir,
        progress=NULL_PROGRESS,
    )
    # rename to the TTS artifact name (reference writes TTS_Voice_Converted)
    if os.path.abspath(converted) != os.path.abspath(convert_path):
        target = (
            convert_path
            if converted.endswith(output_format)
            else os.path.splitext(convert_path)[0] + os.path.splitext(converted)[1]
        )
        os.replace(converted, target)
        convert_path = target
    progress(1.0, "done")
    return convert_path, tts_stereo_path
