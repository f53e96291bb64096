"""Per-f0-method RTF on the 3-minute 48 kHz benchmark song (VERDICT r3 #4).

bench.py times only the headline rmvpe+ path; this tool measures all three
f0 methods (rmvpe+, fcpe, mangio-crepe) with full-size predictors on the
same full pipeline, prewarmed, and prints one JSON line per method:

  {"metric": "rtf_f0_<method>", "value": N, "unit": "x_realtime"}

Run on the real TPU (foreground shells are throttled ~100x):

  nohup python -u tools/bench_f0_methods.py > /tmp/bench_f0.log 2>&1 &

Reference dispatch being covered: /root/reference/rvc/infer/
pipeline.py:132-181 (rmvpe/fcpe/crepe per-method branches).
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
        engine=eng, with_crepe=True, with_fcpe=True,
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

    n_runs = int(os.environ.get("BENCH_F0_RUNS", "3"))
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    methods = tuple(wanted) or ("rmvpe+", "fcpe", "mangio-crepe")
    for method in methods:
        opts = ConversionOptions(index_rate=0.5, protect=0.33,
                                 volume_envelope=0.25, f0_method=method)
        t0 = time.perf_counter()
        n_warm = vc.prewarm(song, opts)
        print(f"{method}: prewarm {n_warm} graphs in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        vc.convert(song, opts)
        print(f"{method}: warm-up convert {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for i in range(n_runs):
            t0 = time.perf_counter()
            vc.convert(song, opts)
            wall = time.perf_counter() - t0
            best = min(best, wall)
            print(f"{method}: run {i + 1}: {wall:.3f}s "
                  f"({seconds / wall:.1f}x)", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": f"rtf_f0_{method.replace('+', 'plus')}",
            "value": round(seconds / best, 2),
            "unit": "x_realtime",
        }), flush=True)


if __name__ == "__main__":
    main()
