"""Microbench: RMVPE salience at bench shapes, fp32 vs bf16 U-Net.

Times the fused mel+salience+decode graph (what the engine's _f0_fn runs)
on the live backend for a 184 s signal. Sync by fetching a scalar sum (the
axon tunnel ignores block_until_ready).

Run: nohup python -u tools/bench_rmvpe.py > /tmp/bench_rmvpe.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu import enable_compilation_cache
    from polgen_rvc_tpu.convert.rmvpe_ckpt import convert_rmvpe_state
    from polgen_rvc_tpu.convert.synthetic import make_rmvpe_state
    from polgen_rvc_tpu.models.rmvpe import rmvpe_mel, rmvpe_salience
    from polgen_rvc_tpu.ops.f0_utils import salience_to_f0

    enable_compilation_cache()
    params = jax.tree.map(jnp.asarray, convert_rmvpe_state(make_rmvpe_state()))

    t_samples = 184 * 16000
    bucket = int(np.ceil(t_samples / (1024 * 160))) * 1024 * 160
    rng = np.random.default_rng(0)
    t = np.arange(bucket) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(bucket)).astype(np.float32)
    audio_d = jnp.asarray(audio)[None]

    def make_fn(cdt):
        @jax.jit
        def fn(params, audio, threshold):
            mel = rmvpe_mel(audio)
            n = mel.shape[-1]
            pad = (-n) % 32
            if pad:
                mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
            sal = rmvpe_salience(params, mel, compute_dtype=cdt)[:, :n]
            return salience_to_f0(sal.astype(jnp.float32), threshold), sal

        return fn

    results = {}
    for name, cdt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = make_fn(cdt)
        t0 = time.perf_counter()
        f0, sal = fn(params, audio_d, 0.03)
        _ = float(np.asarray(jnp.sum(f0)))
        print(f"{name}: first call (compile+run) {time.perf_counter() - t0:.2f}s",
              flush=True)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            f0, sal = fn(params, audio_d, 0.03)
            _ = float(np.asarray(jnp.sum(f0)))
            best = min(best, time.perf_counter() - t0)
        results[name] = (best, np.asarray(f0[0]), np.asarray(sal[0]))
        print(f"{name}: best of 4 = {best:.3f}s", flush=True)

    f32, b16 = results["fp32"][1], results["bf16"][1]
    voiced = f32 > 0
    agree = np.mean((f32 > 0) == (b16 > 0))
    if voiced.any() and (b16[voiced] > 0).any():
        both = voiced & (b16 > 0)
        cents = 1200 * np.abs(np.log2(np.maximum(b16[both], 1e-6)
                                      / np.maximum(f32[both], 1e-6)))
        print(f"voiced agreement: {agree:.4f}; cents p50={np.median(cents):.2f} "
              f"p99={np.percentile(cents, 99):.2f} max={cents.max():.2f}",
              flush=True)
    sal_diff = np.abs(results["fp32"][2] - results["bf16"][2])
    print(f"salience |diff| mean={sal_diff.mean():.5f} max={sal_diff.max():.4f}",
          flush=True)


if __name__ == "__main__":
    main()
