"""Stage-budget profiler for the conversion pipeline on the live backend.

Times, for a 3-minute song with the bench config:
  - host prep (plan + batch building + all dispatches)
  - the final fetch (absorbs all device compute in the async design)
  - per-phase dispatch walls (f0 dispatch, chunk dispatches, finalize)
  - isolated device timings per graph (f0, one chunk batch, finalize),
    measured by fetching a scalar reduction (block_until_ready does not
    sync through the axon tunnel)

Run: nohup python -u tools/profile_stages.py > /tmp/profile.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype") else x)))


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    on_tpu = jax.devices()[0].platform != "cpu"
    seconds = 180.0 if on_tpu else 8.0
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
    song = (0.4 * np.sin(2 * np.pi * 220.0 * t * vibrato)
            + 0.1 * np.sin(2 * np.pi * 440.0 * t)
            + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
    opts = ConversionOptions(index_rate=0.5, protect=0.33, volume_envelope=0.25)

    print("warm-up convert...", flush=True)
    t0 = time.perf_counter()
    vc.convert(song, opts)
    print(f"warm-up: {time.perf_counter() - t0:.2f}s", flush=True)

    # -- wall anatomy over 3 runs -------------------------------------------
    import polgen_rvc_tpu.pipeline.engine as engine_mod

    for run in range(3):
        marks = {}
        orig_asarray = np.asarray
        t0 = time.perf_counter()

        from polgen_rvc_tpu.pipeline.chunking import plan_chunks
        from polgen_rvc_tpu.ops.filters import highpass_filtfilt

        audio = highpass_filtfilt(np.asarray(song, np.float64)).astype(np.float32)
        marks["highpass"] = time.perf_counter() - t0

        plan = plan_chunks(audio, eng)
        marks["plan"] = time.perf_counter() - t0

        p_len_full = plan.padded_audio.shape[0] // eng.window
        dev = vc.compute_f0_device(plan.padded_audio, p_len_full, opts)
        marks["f0_dispatch"] = time.perf_counter() - t0
        out, out_sr = vc.convert(song, opts)
        marks["full_convert_total"] = time.perf_counter() - t0
        print(f"run {run}: " + " ".join(f"{k}={v:.3f}" for k, v in marks.items()),
              flush=True)

    # -- isolated device timings -------------------------------------------
    from polgen_rvc_tpu.pipeline.chunking import gather_chunk_batch, plan_chunks
    from polgen_rvc_tpu.ops.filters import highpass_filtfilt

    audio = highpass_filtfilt(np.asarray(song, np.float64)).astype(np.float32)
    plan = plan_chunks(audio, eng)
    p_len_full = plan.padded_audio.shape[0] // eng.window

    # f0 graph alone
    for _ in range(2):
        t0 = time.perf_counter()
        pf = vc.compute_f0_device(plan.padded_audio, p_len_full, opts)
        td = time.perf_counter() - t0
        s = sync(pf[1])
        print(f"f0: dispatch={td:.3f}s total={time.perf_counter() - t0:.3f}s",
              flush=True)

    # one chunk batch alone
    use_index = vc.index_bank is not None and opts.index_rate > 0
    fn, p_len = vc._chunk_fn(plan.bucket_len, eng.chunk_batch,
                             use_index=use_index, use_protect=True, use_f0=True)
    wav, lengths = gather_chunk_batch(plan, [0, min(1, len(plan.chunks) - 1)], eng)
    if wav.shape[0] < eng.chunk_batch:
        wav = np.concatenate([wav, np.zeros((eng.chunk_batch - wav.shape[0],
                                             wav.shape[1]), np.float32)])
    pitch_b = np.ones((eng.chunk_batch, p_len), np.int32)
    pitchf_b = np.full((eng.chunk_batch, p_len), 220.0, np.float32)
    mask_b = np.ones((eng.chunk_batch, p_len), np.float32)
    key = jax.random.PRNGKey(0)
    args = (jnp.asarray(wav), jnp.asarray(pitch_b), jnp.asarray(pitchf_b),
            jnp.zeros((eng.chunk_batch,), jnp.int32), jnp.asarray(mask_b),
            jnp.float32(0.5), jnp.float32(0.33),
            jnp.zeros((eng.chunk_batch,), jnp.int32), key,
            jnp.arange(eng.chunk_batch, dtype=jnp.int32))
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        td = time.perf_counter() - t0
        s = sync(out)
        print(f"chunk_batch({plan.bucket_len / 16000:.0f}s x {eng.chunk_batch}): "
              f"dispatch={td:.3f}s total={time.perf_counter() - t0:.3f}s",
              flush=True)

    # fetch cost alone: reuse the last converted output size
    out_i16, _ = vc.convert(song, opts)
    n_bytes = out_i16.nbytes
    print(f"output bytes: {n_bytes / 1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
