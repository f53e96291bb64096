"""Microbench: time-folded resblock kernel vs current best, at bench shapes.

s2: C=64  T=1,056,000   s3: C=32  T=2,112,000   (44 s x 2 rows, 48 kHz)

Run: nohup python -u tools/bench_fold.py > /tmp/bench_fold.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu import enable_compilation_cache
    from polgen_rvc_tpu.ops.pallas_resblock import (
        fused_resblock_group, fused_resblock_group_folded,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    B = 2

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timeit(name, fn, *args):
        try:
            out = fn(*args)
            sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            return
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.4f}s", flush=True)

    for c, t, folds, base_tile in (
        (128, 528_000, (), 2048),
        (64, 1_056_000, (), 4096),
        (32, 2_112_000, (4,), 4096),
    ):
        params = []
        for k in kernel_sizes:
            p = {"convs1": [], "convs2": []}
            for _ in range(3):
                for key in ("convs1", "convs2"):
                    p[key].append({
                        "w": (rng.standard_normal((c, c, k)) / np.sqrt(c * k)
                              ).astype(np.float32),
                        "b": (rng.standard_normal(c) * 0.02).astype(np.float32),
                    })
            params.append(p)
        params = jax.tree.map(jnp.asarray, params)
        x = jnp.asarray(rng.standard_normal((B, c, t)) * 0.3, jnp.bfloat16)

        # params as ARGS, not closures (remote-compile 413 + const-folding)
        fn0 = jax.jit(lambda y, sp: fused_resblock_group(
            y, sp, kernel_sizes=kernel_sizes, dilations=dilations,
            time_tile=base_tile))
        timeit(f"C{c} plain t{base_tile}", fn0, x, params)
        for fold in folds:
            for tile in (1024, 2048, 4096):
                fnf = jax.jit(
                    lambda y, sp, fold=fold, tile=tile:
                    fused_resblock_group_folded(
                        y, sp, kernel_sizes=kernel_sizes,
                        dilations=dilations, fold=fold, time_tile=tile))
                timeit(f"C{c} fold{fold} t{tile}", fnf, x, params)


if __name__ == "__main__":
    main()
