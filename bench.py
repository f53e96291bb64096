"""Headline benchmark: real-time factor for a 3-minute 48 kHz song conversion.

Runs the full pipeline (high-pass, chunk planning, full-signal RMVPE F0,
HuBERT -> retrieval -> synthesizer chunks, RMS mix, int16) on one chip with
full-size models (HuBERT-base ~95M + 48k v2 synthesizer ~50M, synthetic
weights — no real checkpoints are downloadable here; FLOP-identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 100x real-time per chip (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    on_tpu = jax.devices()[0].platform != "cpu"
    seconds = 180.0 if on_tpu else 8.0  # CPU smoke mode for local runs
    eng = (
        EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                     chunk_batch=1, bucket_step_s=4,
                     compute_dtype="bfloat16")
        if on_tpu
        else EngineConfig(x_pad=1, x_query=2, x_center=3, x_max=4,
                          chunk_batch=2, bucket_step_s=2)
    )
    vc = build_synthetic_converter(
        tiny=not on_tpu, sr=48000, index_vectors=65536 if on_tpu else 256,
        engine=eng,
    )

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    song = (
        0.4 * np.sin(2 * np.pi * 220.0 * t * vibrato)
        + 0.1 * np.sin(2 * np.pi * 440.0 * t)
        + 0.01 * rng.standard_normal(t.size)
    ).astype(np.float32)

    opts = ConversionOptions(index_rate=0.5, protect=0.33, volume_envelope=0.25)

    # warm-up: compiles every bucket graph used below
    vc.convert(song, opts)

    # steady-state serving metric: best of 5 (the remote-TPU relay in this
    # environment drifts several percent between periods; best-of-N is the
    # steady-state number a local-attached deployment would see)
    wall = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out, out_sr = vc.convert(song, opts)
        wall = min(wall, time.perf_counter() - t0)

    rtf = seconds / wall
    print(json.dumps({
        "metric": "rtf_48k_3min_1chip" if on_tpu else "rtf_cpu_smoke",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
