"""chunk_batch=1 vs 2 on the headline 3-min 48 kHz song (VERDICT r3 #2).

Round 2 measured chunk_batch=2 at 90.7x and blamed song-max bucket pad
waste; per-batch buckets have since landed (convert() buckets each batch at
its own chunks' max), so the batching question is open again: two chunks
per decoder pass halves the per-dispatch overhead and doubles MXU work per
Mosaic grid cell, IF the pad tax of the shared per-batch bucket stays low.

Prints one JSON line per config. Run on the real TPU:

  nohup python -u tools/bench_chunk_batch.py > /tmp/bench_cb.log 2>&1 &
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


def main():
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    seconds = 180.0 if on_tpu else 6.0
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    song = (
        0.4 * np.sin(2 * np.pi * 220.0 * t * vibrato)
        + 0.1 * np.sin(2 * np.pi * 440.0 * t)
        + 0.01 * rng.standard_normal(t.size)
    ).astype(np.float32)
    opts = ConversionOptions(index_rate=0.5, protect=0.33,
                             volume_envelope=0.25)
    n_runs = int(os.environ.get("BENCH_CB_RUNS", "4"))

    for cb in (1, 2):
        eng = (
            EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                         chunk_batch=cb, bucket_step_s=4,
                         compute_dtype="bfloat16")
            if on_tpu
            else EngineConfig(x_pad=1, x_query=2, x_center=3, x_max=4,
                              chunk_batch=cb, bucket_step_s=2)
        )
        vc = build_synthetic_converter(
            tiny=not on_tpu, sr=48000,
            index_vectors=65536 if on_tpu else 256, engine=eng,
        )
        t0 = time.perf_counter()
        n_warm = vc.prewarm(song, opts)
        print(f"cb={cb}: prewarm {n_warm} graphs in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        vc.convert(song, opts)
        print(f"cb={cb}: warm-up convert {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for i in range(n_runs):
            t0 = time.perf_counter()
            vc.convert(song, opts)
            wall = time.perf_counter() - t0
            best = min(best, wall)
            print(f"cb={cb}: run {i + 1}: {wall:.3f}s "
                  f"({seconds / wall:.1f}x)", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": f"rtf_chunk_batch_{cb}",
            "value": round(seconds / best, 2),
            "unit": "x_realtime",
        }), flush=True)
        del vc


if __name__ == "__main__":
    main()
