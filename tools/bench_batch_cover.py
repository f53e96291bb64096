"""Batch-cover throughput: convert_batch(songs) vs serial convert (VERDICT
r3 #3 follow-up — per-chunk-class buckets landed in round 4; this measures
what the packing actually buys on hardware).

Three songs of different lengths (so their chunks land in different bucket
classes and the packer has real work), full-size models. Prints one JSON
line per mode:

  {"metric": "batch_cover_3songs" | "serial_3songs", "value": RTF_total}

Run on the real TPU with nothing else on the chip or host:

  nohup python -u tools/bench_batch_cover.py > /tmp/bench_cover.log 2>&1 &

Reference semantics being covered: one engine serving N requests
(/root/reference processes songs strictly serially, one model load per
request — voice_conversion.py:71-100).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter


def make_song(seconds, seed, f0=220.0):
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    return (
        0.4 * np.sin(2 * np.pi * f0 * t * vib)
        + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
        + 0.01 * rng.standard_normal(t.size)
    ).astype(np.float32)


def main():
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    lens = (180.0, 150.0, 95.0) if on_tpu else (6.0, 5.0, 3.0)
    eng = (
        EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                     chunk_batch=2, bucket_step_s=4,
                     compute_dtype="bfloat16")
        if on_tpu
        else EngineConfig(x_pad=1, x_query=2, x_center=3, x_max=4,
                          chunk_batch=2, bucket_step_s=2)
    )
    vc = build_synthetic_converter(
        tiny=not on_tpu, sr=48000, index_vectors=65536 if on_tpu else 256,
        engine=eng,
    )
    songs = [make_song(s, i, 200.0 + 30 * i) for i, s in enumerate(lens)]
    total_s = sum(lens)
    opts = ConversionOptions(index_rate=0.5, protect=0.33,
                             volume_envelope=0.25)

    t0 = time.perf_counter()
    n_warm = vc.prewarm(songs[0], opts)
    print(f"prewarm {n_warm} graphs in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    # warm the remaining songs' bucket set + batch-cover graphs
    t0 = time.perf_counter()
    vc.convert_batch(songs, opts)
    print(f"warm-up batch cover in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    for s in songs[1:]:
        vc.convert(s, opts)

    n_runs = int(os.environ.get("BENCH_COVER_RUNS", "3"))
    best_b = best_s = float("inf")
    for i in range(n_runs):
        t0 = time.perf_counter()
        vc.convert_batch(songs, opts)
        wall = time.perf_counter() - t0
        best_b = min(best_b, wall)
        print(f"batch run {i + 1}: {wall:.3f}s ({total_s / wall:.1f}x)",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for s in songs:
            vc.convert(s, opts)
        wall = time.perf_counter() - t0
        best_s = min(best_s, wall)
        print(f"serial run {i + 1}: {wall:.3f}s ({total_s / wall:.1f}x)",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "batch_cover_3songs", "value": round(total_s / best_b, 2),
        "unit": "x_realtime",
    }), flush=True)
    print(json.dumps({
        "metric": "serial_3songs", "value": round(total_s / best_s, 2),
        "unit": "x_realtime",
    }), flush=True)


if __name__ == "__main__":
    main()
