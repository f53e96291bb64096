"""Microbench: per-stage timing of the chunk graph at bench shapes.

Times HuBERT, retrieval, enc_p (flash + banded), flow, and the NSF decoder
separately on the live backend (44 s bucket x chunk_batch rows, bf16 —
the bench configuration), so optimization targets the real hot spot.

Run from /root/repo: nohup python -u tools/bench_chunk_stages.py > /tmp/chunk_stages.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from polgen_rvc_tpu import enable_compilation_cache
    from polgen_rvc_tpu.models.hubert import hubert_extract
    from polgen_rvc_tpu.models.synthesizer import (
        synthesizer_infer, text_encoder, flow_reverse,
    )
    from polgen_rvc_tpu.models.nsf import generator_nsf
    from polgen_rvc_tpu.pipeline.config import EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter
    from polgen_rvc_tpu.retrieval.topk import retrieval_blend

    enable_compilation_cache()
    eng = EngineConfig(x_pad=1, x_query=6, x_center=30, x_max=32,
                       chunk_batch=1, bucket_step_s=4,
                       compute_dtype="bfloat16")
    vc = build_synthetic_converter(tiny=False, sr=48000,
                                   index_vectors=65536, engine=eng)
    cdt = jnp.bfloat16
    bucket = 44 * 16000
    B = eng.chunk_batch
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, bucket)) * 0.1, jnp.float32)
    cfg = vc.synth_cfg
    hub_frames = vc.hubert_cfg.num_frames(bucket)
    p_len = min(bucket // eng.window, 2 * hub_frames)

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out if not isinstance(out, tuple) else out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.4f}s", flush=True)
        return out

    hub = jax.jit(lambda p, w: hubert_extract(
        p, vc.hubert_cfg, w, output_layer=vc.hubert_cfg.n_layers,
        final_proj=False, compute_dtype=cdt))
    feats = timeit("hubert", hub, vc.hubert_params, wav)

    retr = jax.jit(lambda f, b: retrieval_blend(
        f, b, jnp.float32(0.5), k=eng.retrieval_k))
    feats2 = timeit("retrieval(64k bank)", retr, feats, vc.index_bank)

    feats_up = jnp.repeat(feats2, 2, axis=1)[:, :p_len]
    x_mask = jnp.ones((B, 1, p_len), cdt)
    pitch = jnp.full((B, p_len), 128, jnp.int32)
    pitchf = jnp.full((B, p_len), 220.0, jnp.float32)

    encb = jax.jit(lambda p, ph: text_encoder(
        p["enc_p"], cfg, ph.astype(cdt), pitch, x_mask, use_flash=False))
    encf = jax.jit(lambda p, ph: text_encoder(
        p["enc_p"], cfg, ph.astype(cdt), pitch, x_mask, use_flash=True))
    m_p, logs_p = timeit("enc_p(banded)", encb, vc.synth_params, feats_up)
    timeit("enc_p(flash)", encf, vc.synth_params, feats_up)

    g = jnp.zeros((B, cfg.gin_channels, 1), cdt)
    z_p = m_p.astype(cdt)

    flow = jax.jit(lambda p, z: flow_reverse(p["flow"], cfg, z, x_mask, g))
    z = timeit("flow", flow, vc.synth_params, z_p)

    dec_p = jax.jit(lambda p, z, f0: generator_nsf(
        p["dec"], cfg, z.astype(cdt), f0, g, rng=None, use_pallas=True))
    dec_x = jax.jit(lambda p, z, f0: generator_nsf(
        p["dec"], cfg, z.astype(cdt), f0, g, rng=None, use_pallas=False))
    timeit("dec(pallas)", dec_p, vc.synth_params, z, pitchf)
    timeit("dec(xla)", dec_x, vc.synth_params, z, pitchf)

    full = jax.jit(lambda hp, sp, bank, w: synthesizer_infer(
        sp, cfg,
        jnp.repeat(retrieval_blend(
            hubert_extract(hp, vc.hubert_cfg, w,
                           output_layer=vc.hubert_cfg.n_layers,
                           final_proj=False, compute_dtype=cdt),
            bank, jnp.float32(0.5), k=eng.retrieval_k), 2, axis=1)[:, :p_len],
        x_mask, pitch, pitchf, sid=jnp.zeros(B, jnp.int32),
        rng=jax.random.PRNGKey(0), compute_dtype=cdt, use_pallas=True))
    timeit("full chunk graph", full, vc.hubert_params, vc.synth_params,
           vc.index_bank, wav)


if __name__ == "__main__":
    main()
