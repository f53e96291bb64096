"""Fused resblock kernel vs the reference-semantics XLA path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from polgen_rvc_tpu.models.nsf import resblock
from polgen_rvc_tpu.ops.pallas_resblock import fused_resblock_group, halo_for


def _mk_params(rng, c, kernel_sizes, dilations):
    out = []
    for k, dils in zip(kernel_sizes, dilations):
        p = {"convs1": [], "convs2": []}
        for d in dils:
            for key in ("convs1", "convs2"):
                p[key].append({
                    "w": (rng.standard_normal((c, c, k)) / np.sqrt(c * k)).astype(np.float32),
                    "b": (rng.standard_normal(c) * 0.02).astype(np.float32),
                })
        out.append(p)
    return out


@pytest.mark.parametrize("c,t", [(32, 1024), (64, 640)])
def test_fused_matches_xla_path(rng, c, t):
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    params = _mk_params(rng, c, kernel_sizes, dilations)
    x = (rng.standard_normal((2, c, t)) * 0.3).astype(np.float32)

    ref = None
    for r, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        y = resblock(jnp.asarray(x), params[r], kernel_size=k, dilations=dils)
        ref = y if ref is None else ref + y
    ref = np.asarray(ref) / len(kernel_sizes)

    got = np.asarray(
        fused_resblock_group(
            jnp.asarray(x), params,
            kernel_sizes=kernel_sizes, dilations=dilations,
            time_tile=256, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)  # bf16 weights


@pytest.mark.parametrize("c,t,fold", [(32, 1024, 4), (64, 640, 2)])
def test_folded_matches_xla_path(rng, c, t, fold):
    """Time-folded kernel (space-to-depth on samples, MXU M-fill for the
    C=32/64 decoder stages) must match the reference-semantics XLA path."""
    from polgen_rvc_tpu.ops.pallas_resblock import fused_resblock_group_folded

    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    params = _mk_params(rng, c, kernel_sizes, dilations)
    x = (rng.standard_normal((2, c, t)) * 0.3).astype(np.float32)

    ref = None
    for r, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        y = resblock(jnp.asarray(x), params[r], kernel_size=k, dilations=dils)
        ref = y if ref is None else ref + y
    ref = np.asarray(ref) / len(kernel_sizes)

    got = np.asarray(
        fused_resblock_group_folded(
            jnp.asarray(x), params,
            kernel_sizes=kernel_sizes, dilations=dilations, fold=fold,
            time_tile=64, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)  # bf16 weights


def test_halo():
    assert halo_for((3,), ((1, 3, 5),)) == (2 + 4 + 6) * 1
    assert halo_for((11,), ((1, 3, 5),)) == 60


def test_non_tile_multiple_length(rng):
    kernel_sizes = (3, 5)
    dilations = ((1, 2), (1, 2))
    params = _mk_params(rng, 32, kernel_sizes, dilations)
    x = (rng.standard_normal((1, 32, 300)) * 0.3).astype(np.float32)
    ref = None
    for r, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        y = resblock(jnp.asarray(x), params[r], kernel_size=k, dilations=dils)
        ref = y if ref is None else ref + y
    ref = np.asarray(ref) / 2
    got = np.asarray(
        fused_resblock_group(
            jnp.asarray(x), params, kernel_sizes=kernel_sizes,
            dilations=dilations, time_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("variant", ["plain", "folded"])
def test_column_split_pipelining_parity(rng, variant):
    """split=2 divides every conv's GEMM into column pieces on alternating
    im2col scratches (MXU/VPU overlap candidate — ROUND_NOTES r4). Each
    output column's contraction is unchanged, so the only permitted drift
    is sub-ulp from the backend's K-blocking at the different matmul
    widths."""
    from polgen_rvc_tpu.ops.pallas_resblock import fused_resblock_group_folded

    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    c = 32
    params = _mk_params(rng, c, kernel_sizes, dilations)
    x = (rng.standard_normal((1, c, 2048)) * 0.3).astype(np.float32)
    fn = (fused_resblock_group if variant == "plain"
          else fused_resblock_group_folded)
    kw = {} if variant == "plain" else {"fold": 4}
    a = np.asarray(fn(jnp.asarray(x), params, kernel_sizes=kernel_sizes,
                      dilations=dilations, interpret=True, time_tile=512,
                      **kw))
    b = np.asarray(fn(jnp.asarray(x), params, kernel_sizes=kernel_sizes,
                      dilations=dilations, interpret=True, time_tile=512,
                      split=2, **kw))
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-6)
