"""Quantify approx-vs-exact retrieval at production bank scale (VERDICT r3 #5).

retrieval_blend defaults to lax.approx_max_k (recall_target=0.99) above
1024 bank vectors; the parity tests all run tiny banks that take the exact
branch. This tool measures, at a realistic bank (default 131072 x 768,
clustered like HuBERT features cluster around phone classes):

  - element recall@k of approx_max_k vs exact top-k
  - the weighted-reconstruction (retrieved) relative L2 delta
  - the blended-output relative L2 delta at index_rate 0.5 and 1.0
  - worst single-frame deltas

On CPU, approx_max_k lowers to an exact top-k (recall 1.0) — run this on
the real TPU to get the meaningful numbers:

  nohup python -u tools/measure_retrieval_approx.py > /tmp/retr_approx.log 2>&1 &

Reference semantics being approximated: faiss IndexIVFFlat nprobe=1 search
(/root/reference/rvc/infer/pipeline.py:239-250), whose own recall on
clustered banks is far below either branch here.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if "--cpu" in sys.argv:
    # CPU smoke mode (approx_max_k lowers to exact top-k on CPU, so the
    # recall will read 1.0 — only the mechanics are exercised)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from polgen_rvc_tpu.retrieval.topk import retrieval_blend


def make_clustered_bank(n, d, n_clusters=512, seed=0):
    """HuBERT-feature-like bank: cluster centers + small within-class spread
    (real voice banks are phone-clustered; near-ties between neighbors make
    this HARDER for approx top-k than an isotropic Gaussian)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    bank = centers[assign] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    return bank.astype(np.float32), centers, assign


def main(n_bank=131072, d=768, t_frames=512, k=8):
    bank, centers, assign = make_clustered_bank(n_bank, d)
    rng = np.random.default_rng(1)
    # query frames: near bank members (the served case) + fully novel ones
    near = bank[rng.integers(0, n_bank, t_frames // 2)] + \
        0.1 * rng.standard_normal((t_frames // 2, d)).astype(np.float32)
    novel = rng.standard_normal((t_frames - t_frames // 2, d)).astype(np.float32)
    feats = np.concatenate([near, novel])[None].astype(np.float32)  # (1, T, d)

    dev = jax.devices()[0]
    print(f"platform={dev.platform} bank={n_bank}x{d} frames={t_frames} k={k}")

    feats_j = jnp.asarray(feats)
    bank_j = jnp.asarray(bank)

    def topk_idx(feats_a, bank_a, exact):
        f32 = feats_a.astype(jnp.float32)
        f_sq = jnp.sum(f32 * f32, axis=-1, keepdims=True)
        b_sq = jnp.sum(bank_a * bank_a, axis=-1)
        cross = jnp.einsum("btd,nd->btn", f32, bank_a)
        d2 = f_sq - 2.0 * cross + b_sq[None, None, :]
        if exact:
            _, idx = jax.lax.top_k(-d2, k)
        else:
            _, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.99)
        return idx

    # arrays travel as jit ARGUMENTS (closures constant-fold: CLAUDE.md)
    idx_exact = np.asarray(
        jax.jit(topk_idx, static_argnums=2)(feats_j, bank_j, True))
    idx_appr = np.asarray(
        jax.jit(topk_idx, static_argnums=2)(feats_j, bank_j, False))
    recall = np.mean([
        len(set(idx_exact[0, t]) & set(idx_appr[0, t])) / k
        for t in range(t_frames)
    ])
    print(f"recall@{k}: {recall:.4f}")

    for rate in (0.5, 1.0):
        out_e = np.asarray(retrieval_blend(
            feats_j, bank_j, jnp.float32(rate), k=k, exact=True))
        out_a = np.asarray(retrieval_blend(
            feats_j, bank_j, jnp.float32(rate), k=k, exact=False))
        num = np.linalg.norm(out_a - out_e, axis=-1)
        den = np.maximum(np.linalg.norm(out_e, axis=-1), 1e-9)
        rel = num / den
        print(f"index_rate={rate}: mean_rel_delta={rel.mean():.2e} "
              f"p99={np.percentile(rel, 99):.2e} max={rel.max():.2e}")

    # serving-relevant timing (exact vs approx) on this backend
    for exact in (True, False):
        fn = jax.jit(
            lambda f, b, r: retrieval_blend(f, b, r, k=k, exact=exact))
        fn(feats_j, bank_j, jnp.float32(0.5))  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(feats_j, bank_j, jnp.float32(0.5))
        np.asarray(jnp.sum(r))  # sync through the relay
        dt = (time.perf_counter() - t0) / 10
        print(f"{'exact' if exact else 'approx'}: {dt * 1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
