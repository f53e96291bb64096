"""Anatomy of the bench warm-up: time every graph's first call separately.

Run: nohup python -u tools/probe_warmup.py > /tmp/probe_warmup.log 2>&1 &
"""

import logging
import sys
import time

import numpy as np

sys.path.insert(0, ".")
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(message)s")


def main():
    import jax

    jax.config.update("jax_log_compiles", True)

    from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    eng = EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                       chunk_batch=1, bucket_step_s=4,
                       compute_dtype="bfloat16")
    t0 = time.perf_counter()
    vc = build_synthetic_converter(tiny=False, sr=48000,
                                   index_vectors=65536, engine=eng)
    print(f"build_synthetic_converter: {time.perf_counter()-t0:.1f}s",
          flush=True)

    # wrap the graph-factory methods so every FIRST call of a cached fn is
    # stamped
    orig_chunk, orig_gain, orig_f0, orig_rms1 = (
        vc._chunk_fn, vc._gain_rows_fn, vc._f0_fn, vc._rms1_fn
    )

    def wrap(tag, orig):
        def factory(*a, **k):
            known = dict(vc._chunk_fns) if tag == "chunk" else dict(vc._trim_fns)
            out = orig(*a, **k)
            fresh = (
                (tag == "chunk" and len(vc._chunk_fns) > len(known))
                or (tag in ("gain", "rms1") and len(vc._trim_fns) > len(known))
            )
            if tag == "f0":
                fresh = True
            if not fresh:
                return out
            fn = out[0] if isinstance(out, tuple) else out

            state = {"first": True}

            def timed(*fa, **fk):
                if state["first"]:
                    state["first"] = False
                    t1 = time.perf_counter()
                    r = fn(*fa, **fk)
                    jax.block_until_ready(r)
                    print(f"[first-call] {tag} {a} -> "
                          f"{time.perf_counter()-t1:.1f}s", flush=True)
                    return r
                return fn(*fa, **fk)

            return (timed, out[1]) if isinstance(out, tuple) else timed

        return factory

    vc._chunk_fn = wrap("chunk", orig_chunk)
    vc._gain_rows_fn = wrap("gain", orig_gain)
    vc._f0_fn = wrap("f0", orig_f0)
    vc._rms1_fn = wrap("rms1", orig_rms1)

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(int(180.0 * sr)) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    song = (0.4 * np.sin(2 * np.pi * 220.0 * t * vib)
            + 0.1 * np.sin(2 * np.pi * 440.0 * t)
            + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
    opts = ConversionOptions(index_rate=0.5, protect=0.33,
                             volume_envelope=0.25)

    t0 = time.perf_counter()
    vc.convert(song, opts)
    print(f"warm-up convert total: {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"chunk graphs: {len(vc._chunk_fns)}, trim/gain graphs: "
          f"{len(vc._trim_fns)}, f0 graphs: {len(vc._f0_fns)}", flush=True)
    t0 = time.perf_counter()
    vc.convert(song, opts)
    print(f"steady convert: {time.perf_counter()-t0:.3f}s", flush=True)


main()
