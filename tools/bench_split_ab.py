"""Interleaved A/B: split=1 vs split=2 at the folded C32 production shape.

The two sequential sweeps in /tmp/bench_split*.log disagreed on the sign of
the split-2 effect at C32-fold4 (relay drift between periods is +-3%);
interleaving the two variants inside one period settles it.

Run on the real TPU: nohup python -u tools/bench_split_ab.py > /tmp/bench_ab.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu import enable_compilation_cache
    from polgen_rvc_tpu.ops.pallas_resblock import fused_resblock_group_folded

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    c, t, tile = 32, 2_112_000, 2048

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
    x = jnp.asarray(rng.standard_normal((2, c, t)) * 0.3, jnp.bfloat16)

    fns = {
        s: jax.jit(lambda y, sp, s=s: fused_resblock_group_folded(
            y, sp, kernel_sizes=kernel_sizes, dilations=dilations,
            fold=4, time_tile=tile, split=s))
        for s in (1, 2)
    }
    times = {1: [], 2: []}
    for s, fn in fns.items():  # compile/load both before any timing
        np.asarray(jnp.sum(fn(x, params).astype(jnp.float32)))
    for rep in range(8):
        for s in (1, 2) if rep % 2 == 0 else (2, 1):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fns[s](x, params).astype(jnp.float32)))
            times[s].append(time.perf_counter() - t0)
    for s in (1, 2):
        v = np.array(times[s])
        print(f"split{s}: median {np.median(v):.4f}s  min {v.min():.4f}s  "
              f"all {np.round(v, 4).tolist()}", flush=True)


if __name__ == "__main__":
    main()
