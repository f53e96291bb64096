"""On-device parity + timing: flash rel-attention vs the banded XLA path.

Run on TPU: python tools/validate_flash_attention.py
(CI cannot run the flash kernel — TPU-only — so this script is the
correctness gate; see tests/test_models_synthesizer.py for the banded
path's CPU-checked reference semantics.)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import polgen_rvc_tpu

polgen_rvc_tpu.enable_compilation_cache()

from polgen_rvc_tpu.models.synthesizer import relative_attention
from polgen_rvc_tpu.ops.flash_relattn import relative_attention_flash


def main():
    rng = np.random.default_rng(0)
    b, c, t, heads, w = 2, 192, 3598, 2, 10
    dk = c // heads
    x = jnp.asarray(rng.standard_normal((b, c, t)) * 0.3, jnp.float32)
    params = {
        "q": {"w": jnp.asarray(rng.standard_normal((c, c, 1)) / np.sqrt(c), jnp.float32),
              "b": jnp.zeros(c, jnp.float32)},
        "k": {"w": jnp.asarray(rng.standard_normal((c, c, 1)) / np.sqrt(c), jnp.float32),
              "b": jnp.zeros(c, jnp.float32)},
        "v": {"w": jnp.asarray(rng.standard_normal((c, c, 1)) / np.sqrt(c), jnp.float32),
              "b": jnp.zeros(c, jnp.float32)},
        "o": {"w": jnp.asarray(rng.standard_normal((c, c, 1)) / np.sqrt(c), jnp.float32),
              "b": jnp.zeros(c, jnp.float32)},
        "emb_rel_k": jnp.asarray(
            rng.standard_normal((1, 2 * w + 1, dk)) * dk**-0.5, jnp.float32),
        "emb_rel_v": jnp.asarray(
            rng.standard_normal((1, 2 * w + 1, dk)) * dk**-0.5, jnp.float32),
    }
    # contiguous-prefix mask (last 300 frames invalid)
    mask1d = jnp.asarray(
        (np.arange(t) < t - 300).astype(np.float32)[None, None, :]
    )
    mask1d = jnp.broadcast_to(mask1d, (b, 1, t))
    attn_mask = mask1d[:, :, None, :] * mask1d[:, :, :, None]

    ref_fn = jax.jit(lambda xx, p: relative_attention(
        xx, p, n_heads=heads, window_size=w, attn_mask=attn_mask))
    fl_fn = jax.jit(lambda xx, p: relative_attention_flash(
        xx, p, n_heads=heads, window_size=w, frame_mask=mask1d))

    ref = np.asarray(ref_fn(x, params))
    got = np.asarray(fl_fn(x, params))
    valid = np.asarray(mask1d[0, 0]).astype(bool)
    diff = np.abs(ref[:, :, valid] - got[:, :, valid])
    print(f"parity: max={diff.max():.3e} mean={diff.mean():.3e} "
          f"(valid region, fp32)")
    assert diff.max() < 5e-3, "flash path diverges"

    for name, fn in (("banded", ref_fn), ("flash", fl_fn)):
        best = 9e9
        for _ in range(3):
            t0 = time.time()
            _ = float(jnp.sum(fn(x, params)))
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.4f}s")


if __name__ == "__main__":
    main()
