"""Stage anatomy of the DEVICE-resident mangio-crepe F0 path on the real
TPU (VERDICT r4 #3): separates the salience slab graphs from the fused
scan-Viterbi decode graph so the next optimization targets the real cost.

Timing fences use np.asarray(jnp.sum(x)) — block_until_ready does not
synchronize through the axon relay (CLAUDE.md).

Run: nohup python -u tools/profile_crepe_device.py > /tmp/crepe_dev.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter


def fence(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    import jax.numpy as jnp

    seconds = 180.0
    eng = EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                       chunk_batch=2, bucket_step_s=4,
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
    t0 = time.perf_counter()
    vc.prewarm(song, opts)
    print(f"prewarm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    vc.convert(song, opts)
    print(f"warm convert {time.perf_counter() - t0:.1f}s", flush=True)

    for i in range(3):
        t0 = time.perf_counter()
        vc.convert(song, opts)
        print(f"full convert: {time.perf_counter() - t0:.3f}s", flush=True)

    # --- stage anatomy of the device F0 path ---
    from polgen_rvc_tpu.pipeline.crepe_method import _FRAME_BUCKET

    pad = eng.x_pad * sr
    audio_pad = np.pad(song, (pad, pad), mode="reflect")
    hop = int(opts.hop_length)
    p_len = audio_pad.shape[0] // vc.engine.window

    for i in range(3):
        t0 = time.perf_counter()
        up = vc._upload_audio(audio_pad)
        audio_dev, inv_scale, tt = up
        fence(audio_dev)
        t_up = time.perf_counter()

        n = tt // hop + 1
        padded = int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET
        fn = vc._crepe_fn(int(audio_dev.shape[1]))
        outs = [
            fn(vc.crepe_params, audio_dev, inv_scale, jnp.int32(start),
               jnp.int32(hop))
            for start in range(0, padded, _FRAME_BUCKET)
        ]
        fence(outs[-1])
        t_sal = time.perf_counter()

        sal = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        shift = np.float32(2.0 ** (opts.pitch / 12.0))
        out_bucket = int(audio_dev.shape[1]) // 160 + 1
        dec = vc._crepe_decode_fn(padded, out_bucket, opts.f0_min,
                                  opts.f0_max)
        pitch, pitchf = dec(sal, jnp.int32(n), jnp.int32(p_len), shift)
        fence(pitchf)
        t_dec = time.perf_counter()
        print(f"device f0: upload {t_up - t0:.3f}s  salience "
              f"({len(outs)} slabs) {t_sal - t_up:.3f}s  decode(scan "
              f"viterbi+cents+resize) {t_dec - t_sal:.3f}s  "
              f"total {t_dec - t0:.3f}s  T={n}", flush=True)

    # host C++ alternative at the same T, for comparison (salience fetch
    # + banded viterbi + cents) — the r4 path
    from polgen_rvc_tpu.models.crepe import crepe_f0_decode

    for i in range(2):
        t0 = time.perf_counter()
        outs = [
            fn(vc.crepe_params, audio_dev, inv_scale, jnp.int32(start),
               jnp.int32(hop))
            for start in range(0, padded, _FRAME_BUCKET)
        ]
        vc._start_host_copy(*outs)
        sal_h = np.concatenate([np.asarray(o) for o in outs])[:n]
        t_fetch = time.perf_counter()
        f0 = crepe_f0_decode(sal_h, f0_min=opts.f0_min, f0_max=opts.f0_max)
        t_dec = time.perf_counter()
        print(f"host alt: salience+fetch {t_fetch - t0:.3f}s  C++ decode "
              f"{t_dec - t_fetch:.3f}s  total {t_dec - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
