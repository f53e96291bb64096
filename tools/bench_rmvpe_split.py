"""Microbench: RMVPE stage split (mel / U-Net / BiGRU / full) on the live
backend at bench shapes, fp32.

Run: nohup python -u tools/bench_rmvpe_split.py > /tmp/rmvpe_split.log 2>&1 &
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
    from polgen_rvc_tpu.ops.rnn import bigru

    enable_compilation_cache()
    params = jax.tree.map(jnp.asarray, convert_rmvpe_state(make_rmvpe_state()))

    t_samples = 184 * 16000
    bucket = int(np.ceil(t_samples / (1024 * 160))) * 1024 * 160
    rng = np.random.default_rng(0)
    tt = np.arange(bucket) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * tt)
             + 0.01 * rng.standard_normal(bucket)).astype(np.float32)
    audio_d = jnp.asarray(audio)[None]

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.4f}s", flush=True)
        return out

    mel_fn = jax.jit(lambda a: rmvpe_mel(a))
    mel = timeit("mel", mel_fn, audio_d)
    n = mel.shape[-1]
    pad = (-n) % 32
    melp = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
    nf = melp.shape[-1]
    print(f"frames={nf}", flush=True)

    sal_fn = jax.jit(lambda p, m: rmvpe_salience(p, m))
    timeit("salience(unet+gru+fc)", sal_fn, params, melp)

    sal_fn_p = jax.jit(lambda p, m: rmvpe_salience(p, m, use_pallas=True))
    out_p = timeit("salience(pallas folded unet)", sal_fn_p, params, melp)
    out_x = sal_fn(params, melp)
    d = np.abs(np.asarray(out_p) - np.asarray(out_x))
    print(f"salience |pallas-xla|: mean={d.mean():.6f} max={d.max():.6f}",
          flush=True)

    x = jnp.asarray(rng.standard_normal((1, nf, 384)) * 0.3, jnp.float32)
    gru_fn = jax.jit(lambda p, xx: bigru(xx, p["gru"]))
    timeit("bigru", gru_fn, params, x)


if __name__ == "__main__":
    main()
