"""Does the folded U-Net's rounding shift the F0 decode? (live backend)

Run: nohup python -u tools/bench_unet_decode.py > /tmp/unet_decode.log 2>&1 &
"""

import sys

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

    bucket = 8 * 1024 * 160
    rng = np.random.default_rng(0)
    tt = np.arange(bucket) / 16000
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * tt)
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * tt * vib)
             + 0.1 * np.sin(2 * np.pi * 440.0 * tt)
             + 0.01 * rng.standard_normal(bucket)).astype(np.float32)
    audio_d = jnp.asarray(audio)[None]

    def f0_of(use_pallas):
        @jax.jit
        def fn(p, a):
            mel = rmvpe_mel(a)
            n = mel.shape[-1]
            pad = (-n) % 32
            if pad:
                mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
            sal = rmvpe_salience(p, mel, use_pallas=use_pallas)[:, :n]
            return salience_to_f0(sal.astype(jnp.float32), 0.03)

        return np.asarray(fn(params, audio_d))[0]

    f0_x = f0_of(False)
    f0_p = f0_of(True)
    vx, vp = f0_x > 0, f0_p > 0
    agree = float((vx == vp).mean())
    both = vx & vp
    cents = 1200 * np.abs(np.log2(np.maximum(f0_p[both], 1e-9)
                                  / np.maximum(f0_x[both], 1e-9)))
    print(f"voiced agreement: {agree:.4f}", flush=True)
    if cents.size:
        print(f"cents diff p50={np.percentile(cents, 50):.2f} "
              f"p99={np.percentile(cents, 99):.2f} max={cents.max():.2f}",
              flush=True)


if __name__ == "__main__":
    main()
