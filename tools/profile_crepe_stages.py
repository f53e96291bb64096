"""Anatomy of the mangio-crepe conversion on the real TPU: times the
salience dispatch+fetch, the host Viterbi decode, and the remaining
pipeline separately so the next optimization targets the real cost.

Run: nohup python -u tools/profile_crepe_stages.py > /tmp/crepe_stages.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter


def main():
    seconds = 180.0
    eng = EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                       chunk_batch=1, bucket_step_s=4,
                       compute_dtype="bfloat16")
    vc = build_synthetic_converter(
        tiny=False, sr=48000, index_vectors=65536,
        engine=eng, with_crepe=True, with_fcpe=False,
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

    opts = ConversionOptions(index_rate=0.5, protect=0.33,
                             volume_envelope=0.25, f0_method="mangio-crepe")
    vc.prewarm(song, opts)
    vc.convert(song, opts)  # warm

    # --- full convert wall (reference) ---
    for i in range(3):
        t0 = time.perf_counter()
        vc.convert(song, opts)
        print(f"full convert: {time.perf_counter() - t0:.3f}s", flush=True)

    # --- isolated crepe F0 (what crepe_method.crepe_f0 does) ---
    import jax.numpy as jnp
    from polgen_rvc_tpu.pipeline.crepe_method import _FRAME_BUCKET
    from polgen_rvc_tpu.models.crepe import crepe_f0_decode

    # mirror engine padding: convert() pads the signal with x_pad*sr
    pad = eng.x_pad * sr
    audio_pad = np.pad(song, (pad, pad), mode="reflect")
    hop = int(opts.hop_length)

    for i in range(3):
        t0 = time.perf_counter()
        up = vc._upload_audio(audio_pad)
        audio_dev, inv_scale, tt = up
        n = tt // hop + 1
        padded = int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET
        fn = vc._crepe_fn(int(audio_dev.shape[1]))
        outs = [
            fn(vc.crepe_params, audio_dev, inv_scale, jnp.int32(start),
               jnp.int32(hop))
            for start in range(0, padded, _FRAME_BUCKET)
        ]
        t1 = time.perf_counter()
        vc._start_host_copy(*outs)
        sal = np.concatenate([np.asarray(o) for o in outs])[:n]
        t2 = time.perf_counter()
        f0 = crepe_f0_decode(sal, f0_min=opts.f0_min, f0_max=opts.f0_max)
        t3 = time.perf_counter()
        print(f"crepe f0: dispatch {t1-t0:.3f}s  fetch {t2-t1:.3f}s "
              f"(sal {sal.nbytes/1e6:.1f} MB {sal.dtype})  "
              f"decode {t3-t2:.3f}s  total {t3-t0:.3f}s  T={n}", flush=True)

    # decode sub-anatomy at production T
    sal64 = sal
    t0 = time.perf_counter()
    from polgen_rvc_tpu.models.crepe import viterbi_path, bins_to_f0
    freqs_mask_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    probs = sal64.astype(np.float64).copy()
    t_cast = time.perf_counter() - t0
    t0 = time.perf_counter()
    path = viterbi_path(probs)
    t_vit = time.perf_counter() - t0
    t0 = time.perf_counter()
    bins_to_f0(path, sal64)
    t_bins = time.perf_counter() - t0
    print(f"decode anatomy: imports {freqs_mask_t:.3f}s cast64 {t_cast:.3f}s "
          f"viterbi {t_vit:.3f}s bins_to_f0 {t_bins:.3f}s", flush=True)


if __name__ == "__main__":
    main()
