"""Time each production graph of the bench conversion in isolation (warm).

Run: nohup python -u tools/probe_graphs.py > /tmp/probe_graphs.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu.ops.filters import highpass_filtfilt
    from polgen_rvc_tpu.pipeline.chunking import plan_chunks
    from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    eng = EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                       chunk_batch=1, bucket_step_s=4,
                       compute_dtype="bfloat16")
    vc = build_synthetic_converter(tiny=False, sr=48000,
                                   index_vectors=65536, engine=eng)
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(int(180.0 * sr)) / sr
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    song = (0.4 * np.sin(2 * np.pi * 220.0 * t * vibrato)
            + 0.1 * np.sin(2 * np.pi * 440.0 * t)
            + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
    opts = ConversionOptions(index_rate=0.5, protect=0.33,
                             volume_envelope=0.25)

    def sync(x):
        if isinstance(x, tuple):
            x = x[0]
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    t0 = time.perf_counter()
    vc.convert(song, opts)
    print(f"warm-up convert: {time.perf_counter() - t0:.1f}s", flush=True)
    for r in range(2):
        t0 = time.perf_counter()
        vc.convert(song, opts)
        print(f"convert: {time.perf_counter() - t0:.3f}s", flush=True)

    audio = highpass_filtfilt(np.asarray(song, np.float64)).astype(np.float32)
    plan = plan_chunks(audio, eng)
    p_len_full = plan.padded_audio.shape[0] // eng.window

    # upload alone
    for _ in range(2):
        t0 = time.perf_counter()
        up = vc._upload_audio(plan.padded_audio)
        s = sync(up[0])
        print(f"upload(+sync): {time.perf_counter() - t0:.3f}s", flush=True)

    # f0 graph alone (upload excluded)
    for _ in range(2):
        t0 = time.perf_counter()
        pf = vc.compute_f0_device(plan.padded_audio, p_len_full, opts, up)
        sync(pf[0])
        print(f"f0 device: {time.perf_counter() - t0:.3f}s", flush=True)

    # each chunk graph alone (device-resident inputs, production emit)
    pitch_dev, pitchf_dev = pf
    use_index = vc.index_bank is not None and opts.index_rate > 0
    step_bucket = eng.bucket_step_s * eng.sample_rate
    rngk = jax.random.PRNGKey(0)
    for ci, c in enumerate(plan.chunks):
        slen = c.slice_end - c.slice_start
        bucket = int(np.ceil(slen / step_bucket)) * step_bucket
        fn, p_len = vc._chunk_fn(
            bucket, 1, use_index=use_index, use_protect=True, use_f0=True,
            devf0_frames=int(pitch_dev.shape[1]),
            dev_wav_bucket=int(up[0].shape[1]), emit="trimf",
        )
        v = min(slen // eng.window, 2 * vc.hubert_cfg.num_frames(slen))
        mask = np.zeros((1, p_len), np.float32)
        mask[0, :v] = 1.0
        args = (
            up[0], pitch_dev, pitchf_dev,
            jnp.asarray([c.slice_start // eng.window], jnp.int32),
            jnp.asarray(mask),
            jnp.asarray([vc.hubert_cfg.num_frames(slen)], jnp.int32),
            jnp.float32(0.5), jnp.float32(0.33),
            jnp.zeros((1,), jnp.int32), rngk,
            jnp.asarray([ci], jnp.int32),
            up[1],
            jnp.asarray([c.slice_start], jnp.int32),
            jnp.asarray([slen], jnp.int32),
        )
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"chunk {ci} bucket={bucket/16000:.0f}s: {best:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
