"""Microbench: NSF decoder per-stage timing at bench shapes (44s x 2, bf16).

Times each upsample stage's transposed conv (pallas vs xla) and resblock
group (pallas vs xla) separately, plus the sine source, to locate the
decoder's real hot spot before optimizing.

Run from /root/repo: nohup python -u tools/bench_dec_stages.py > /tmp/dec_stages.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu import enable_compilation_cache
    from polgen_rvc_tpu.pipeline.config import EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter
    from polgen_rvc_tpu.models.nsf import (
        source_module, _resblock_dilations, resblock,
    )
    from polgen_rvc_tpu.ops.conv import conv_transpose1d
    from polgen_rvc_tpu.ops.pallas_convtranspose import conv_transpose1d_pallas
    from polgen_rvc_tpu.ops.pallas_resblock import fused_resblock_group

    enable_compilation_cache()
    eng = EngineConfig(compute_dtype="bfloat16", chunk_batch=2)
    vc = build_synthetic_converter(tiny=False, sr=48000, engine=eng)
    cfg = vc.synth_cfg
    params = vc.synth_params["dec"]
    cdt = jnp.bfloat16
    B = 1
    T0 = 4400
    rng = np.random.default_rng(0)

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

    f0 = jnp.full((B, T0), 220.0, jnp.float32)
    src_fn = jax.jit(lambda p, f: source_module(
        p["m_source"], f, cfg.upp, cfg.sr, rng=None, dtype=cdt))
    timeit("sine_source", src_fn, params, f0)

    kd = _resblock_dilations(cfg)
    rates = [int(r) for r in cfg.upsample_rates]
    kernels = [int(k) for k in cfg.upsample_kernel_sizes]
    C = cfg.upsample_initial_channel
    t = T0
    for i, (u, k) in enumerate(zip(rates, kernels)):
        c_in, c_out = C // (2 ** i), C // (2 ** (i + 1))
        x = jnp.asarray(rng.standard_normal((B, c_in, t)) * 0.1, cdt)
        w = params["ups"][i]["w"]
        b = params["ups"][i]["b"]
        up_x = jax.jit(lambda xx, ww, bb, u=u, k=k: conv_transpose1d(
            xx, ww, bb, stride=u, padding=(k - u) // 2))
        timeit(f"s{i} upconv(xla)  C{c_in}->{c_out} T{t}", up_x, x, w, b)
        if k - 2 * ((k - u) // 2) == u:
            tile = 128 if u >= 12 else 256
            up_p = jax.jit(lambda xx, ww, bb, u=u, k=k, tile=tile:
                           conv_transpose1d_pallas(
                               xx, ww, bb, stride=u, padding=(k - u) // 2,
                               time_tile=tile))
            timeit(f"s{i} upconv(plls) C{c_in}->{c_out} T{t}", up_p, x, w, b)
        t *= u
        y = jnp.asarray(rng.standard_normal((B, c_out, t)) * 0.1, cdt)
        stage_params = [params["resblocks"][i * len(kd) + j]
                        for j in range(len(kd))]
        ks = [kk for kk, _ in kd]
        ds = [dd for _, dd in kd]

        def rb_xla(yy, sp=stage_params):
            acc = None
            for j, (ksz, dil) in enumerate(kd):
                r = resblock(yy, sp[j], kernel_size=ksz, dilations=dil)
                acc = r if acc is None else acc + r
            return acc / len(kd)

        timeit(f"s{i} resblocks(xla) C{c_out} T{t}", jax.jit(rb_xla), y)
        if c_out <= 128:
            tile = 2048 if c_out <= 32 else 1024 if c_out <= 64 else 512
            rb_p = jax.jit(lambda yy, sp=stage_params, tile=tile:
                           fused_resblock_group(
                               yy, sp, kernel_sizes=ks, dilations=ds,
                               time_tile=tile))
            timeit(f"s{i} resblocks(plls t{tile}) C{c_out} T{t}", rb_p, y)
            for tile2 in ({32: (4096,), 64: (2048,), 128: (1024, 2048)}
                          .get(c_out, ())):
                rb_p2 = jax.jit(lambda yy, sp=stage_params, tile=tile2:
                                fused_resblock_group(
                                    yy, sp, kernel_sizes=ks, dilations=ds,
                                    time_tile=tile))
                timeit(f"s{i} resblocks(plls t{tile2}) C{c_out} T{t}",
                       rb_p2, y)
        else:
            rb_p1 = jax.jit(lambda yy, sp=stage_params:
                            sum(fused_resblock_group(
                                yy, [sp[j]], kernel_sizes=[kd[j][0]],
                                dilations=[kd[j][1]], time_tile=256)
                                for j in range(len(kd))) / len(kd))
            timeit(f"s{i} resblocks(plls-sep t256) C{c_out} T{t}", rb_p1, y)


if __name__ == "__main__":
    main()
