"""Sharded paths on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from polgen_rvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == len(jax.devices())


def test_shard_batch_layout(rng):
    mesh = make_mesh(4, 2)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    xd = shard_batch(jax.numpy.asarray(x), mesh)
    np.testing.assert_array_equal(np.asarray(xd), x)
    # batch dim split over "data"
    assert len(xd.sharding.device_set) == 8


def test_engine_with_mesh_dp_tp(rng):
    """Full conversion with DP chunks + TP hubert over the virtual mesh."""
    from polgen_rvc_tpu.pipeline.config import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    mesh = make_mesh(4, 2)
    eng = EngineConfig(x_pad=1, x_query=2, x_center=4, x_max=5,
                       chunk_batch=4, bucket_step_s=2)
    vc = build_synthetic_converter(
        tiny=True, sr=48000, index_vectors=64, engine=eng, mesh=mesh
    )
    t = np.arange(16000 * 9) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out, sr = vc.convert(audio, ConversionOptions(index_rate=0.4, protect=0.2))
    assert sr == 48000 and out.size > 0
    assert np.isfinite(out.astype(np.float64)).all()
    # matches the unsharded result (same graph semantics)
    vc2 = build_synthetic_converter(
        tiny=True, sr=48000, index_vectors=64, engine=eng, mesh=None
    )
    out2, _ = vc2.convert(audio, ConversionOptions(index_rate=0.4, protect=0.2))
    n = min(len(out), len(out2))
    np.testing.assert_allclose(
        out[:n].astype(np.float64), out2[:n].astype(np.float64), atol=2.0
    )
