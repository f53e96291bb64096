"""Microbench: column-split (MXU/VPU overlap) resblock kernel vs current.

The fused kernels are VPU-bound (im2col builds) with the MXU idle during
builds; split=2 alternates each conv's GEMM column pieces over two im2col
scratches so the piece-1 build can overlap the piece-0 GEMM. This measures
split in {1, 2, 3} at the production decoder shapes (44 s x 2 rows, 48 kHz).

Run on the real TPU: nohup python -u tools/bench_split.py > /tmp/bench_split.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            return
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.4f}s", flush=True)

    # decoder stages: (C, T, folded?, tile). The first three tiles match
    # models/nsf.py's production choices; the wider-tile rows measure
    # whether split shifts the tile optimum (scratch VMEM doubles at
    # split=2, but overlap may favor longer tiles).
    shapes = (
        (128, 528_000, False, 1024),
        (64, 1_056_000, False, 2048),
        (32, 2_112_000, True, 2048),
        (128, 528_000, False, 2048),
        (64, 1_056_000, False, 4096),
    )
    if "--production-only" in sys.argv:
        shapes = shapes[:3]
    for c, t, folded, tile in shapes:
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

        # split=3 measured >= split=2 at every shape in the first sweep
        for split in (1, 2) if "--production-only" in sys.argv else (1, 2, 3):
            # params as ARGS, not closures (remote-compile 413 + const-fold)
            if folded:
                fn = jax.jit(lambda y, sp, s=split: fused_resblock_group_folded(
                    y, sp, kernel_sizes=kernel_sizes, dilations=dilations,
                    fold=4, time_tile=tile, split=s))
                timeit(f"C{c} fold4 t{tile} split{split}", fn, x, params)
            else:
                fn = jax.jit(lambda y, sp, s=split: fused_resblock_group(
                    y, sp, kernel_sizes=kernel_sizes, dilations=dilations,
                    time_tile=tile, split=s))
                timeit(f"C{c} plain t{tile} split{split}", fn, x, params)


if __name__ == "__main__":
    main()
