"""Synthesizer model: conversion + structural/numerical checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polgen_rvc_tpu.convert.rvc_ckpt import build_config, convert_synthesizer_state
from polgen_rvc_tpu.convert.synthetic import make_rvc_checkpoint
from polgen_rvc_tpu.models.nsf import sine_source
from polgen_rvc_tpu.models.synthesizer import (
    _abs_to_rel,
    _rel_to_abs,
    _window_rel_embeddings,
    synthesizer_infer,
)


@pytest.fixture(scope="module")
def tiny_model():
    cpt = make_rvc_checkpoint(sr=48000, tiny=True, seed=0)
    cfg = build_config(cpt["config"], use_f0=True, version=cpt["version"])
    params = convert_synthesizer_state(cpt["weight"], cfg)
    return cfg, params


def test_rel_position_reshape_tricks(rng):
    """The pad/reshape relative->absolute conversion equals a direct gather."""
    b, h, t, d = 1, 2, 7, 4
    w = 10
    emb = rng.standard_normal((1, 2 * w + 1, d)).astype(np.float32)
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)

    rel_k = np.asarray(_window_rel_embeddings(jnp.asarray(emb), t, w))
    rel_logits = np.einsum("bhtd,xrd->bhtr", q, rel_k)
    got = np.asarray(_rel_to_abs(jnp.asarray(rel_logits)))

    # direct: score[t, s] = q[t] . table[s - t + w], zero outside window
    want = np.zeros((b, h, t, t), np.float32)
    for ti in range(t):
        for s in range(t):
            dpos = s - ti
            if -w <= dpos <= w:
                want[:, :, ti, s] = np.einsum("bhd,d->bh", q[:, :, ti], emb[0, dpos + w])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # abs->rel: out[t] = sum_s p[t,s] * table[s - t + w]
    p = rng.random((b, h, t, t)).astype(np.float32)
    rel_v = np.asarray(_window_rel_embeddings(jnp.asarray(emb), t, w))
    got2 = np.einsum("bhtr,xrd->bhtd", np.asarray(_abs_to_rel(jnp.asarray(p))), rel_v)
    want2 = np.zeros((b, h, t, d), np.float32)
    for ti in range(t):
        for s in range(t):
            dpos = s - ti
            if -w <= dpos <= w:
                want2[:, :, ti] += p[:, :, ti, s, None] * emb[0, dpos + w]
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)


def test_sine_source_matches_reference_algorithm(rng):
    """Closed-form phase == the reference's audio-rate cumsum formulation.

    The reference (generators.py:117-147) nearest-upsamples per-frame
    rad values and cumsums at audio rate (wrap corrections are whole cycles,
    no effect on sin). Re-derive that in float64 numpy and compare.
    """
    upp, sr, t = 12, 48000, 40
    f0 = np.zeros((1, t), np.float32)
    f0[0, 5:30] = 220.0 + 10 * rng.random(25)
    # reference-style: nearest upsample then cumsum over samples
    rad = (f0.astype(np.float64) / sr) % 1.0
    rad_up = np.repeat(rad, upp, axis=-1)
    phase_ref = np.cumsum(rad_up, axis=-1)
    sine_ref = np.sin(2 * np.pi * phase_ref) * 0.1
    uv = (f0 > 0).astype(np.float64)
    uv_up = np.repeat(uv, upp, axis=-1)
    want = sine_ref * uv_up  # deterministic part

    got = np.asarray(sine_source(jnp.asarray(f0), upp, sr, rng=None))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_synthesizer_infer_shapes_and_determinism(tiny_model):
    cfg, params = tiny_model
    b, t = 2, 20
    rng = np.random.default_rng(3)
    phone = jnp.asarray(rng.standard_normal((b, t, cfg.input_dim)), jnp.float32)
    mask = jnp.ones((b, 1, t), jnp.float32)
    pitch = jnp.asarray(rng.integers(1, 255, (b, t)), jnp.int32)
    nsff0 = jnp.asarray(rng.uniform(100, 300, (b, t)), jnp.float32)

    fn = jax.jit(
        lambda ph, m, pi, f0: synthesizer_infer(
            params, cfg, ph, m, pi, f0, sid=jnp.zeros((b,), jnp.int32), rng=None
        )
    )
    audio = np.asarray(fn(phone, mask, pitch, nsff0))
    assert audio.shape == (b, t * cfg.upp)
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() <= 1.0  # tanh output
    # deterministic without rng
    audio2 = np.asarray(fn(phone, mask, pitch, nsff0))
    np.testing.assert_array_equal(audio, audio2)
    # with rng, noise enters the latent
    a3 = synthesizer_infer(
        params, cfg, phone, mask, pitch, nsff0,
        sid=jnp.zeros((b,), jnp.int32), rng=jax.random.PRNGKey(0),
    )
    assert np.abs(np.asarray(a3) - audio).max() > 1e-6


def test_synthesizer_mask_zeroes_padding(tiny_model):
    """Masked (padded) frames must not change valid-region output."""
    cfg, params = tiny_model
    rng = np.random.default_rng(4)
    t_valid, t_pad = 12, 6
    t = t_valid + t_pad
    phone_v = rng.standard_normal((1, t_valid, cfg.input_dim)).astype(np.float32)
    pitch_v = rng.integers(1, 255, (1, t_valid)).astype(np.int32)
    f0_v = rng.uniform(100, 300, (1, t_valid)).astype(np.float32)

    def run(phone, pitch, f0, mask):
        return np.asarray(
            synthesizer_infer(
                params, cfg, jnp.asarray(phone), jnp.asarray(mask),
                jnp.asarray(pitch), jnp.asarray(f0),
                sid=jnp.zeros((1,), jnp.int32), rng=None,
            )
        )

    # padded with garbage + mask
    phone_p = np.concatenate(
        [phone_v, 9.0 * np.ones((1, t_pad, cfg.input_dim), np.float32)], axis=1
    )
    pitch_p = np.concatenate([pitch_v, 200 * np.ones((1, t_pad), np.int32)], axis=1)
    f0_p = np.concatenate([f0_v, 500 * np.ones((1, t_pad), np.float32)], axis=1)
    mask = np.concatenate(
        [np.ones((1, 1, t_valid), np.float32), np.zeros((1, 1, t_pad), np.float32)],
        axis=2,
    )
    out_pad = run(phone_p, pitch_p, f0_p, mask)[:, : t_valid * cfg.upp]
    out_ref = run(phone_v, pitch_v, f0_v, np.ones((1, 1, t_valid), np.float32))
    # conv halos at the boundary are expected; compare away from the seam
    margin = 4 * cfg.upp
    np.testing.assert_allclose(
        out_pad[:, :-margin], out_ref[:, :-margin], rtol=1e-3, atol=1e-4
    )


def test_banded_rel_helpers_match_dense(rng):
    from polgen_rvc_tpu.models.synthesizer import _band_to_dense, _dense_band_extract

    t, w = 9, 3
    band = rng.standard_normal((2, t, 2 * w + 1)).astype(np.float32)
    got = np.asarray(_band_to_dense(jnp.asarray(band), t, w))
    want = np.zeros((2, t, t), np.float32)
    for ti in range(t):
        for s in range(t):
            d = s - ti
            if -w <= d <= w:
                want[:, ti, s] = band[:, ti, d + w]
    np.testing.assert_allclose(got, want, atol=1e-6)

    p = rng.standard_normal((2, t, t)).astype(np.float32)
    got_b = np.asarray(_dense_band_extract(jnp.asarray(p), t, w))
    want_b = np.zeros((2, t, 2 * w + 1), np.float32)
    for ti in range(t):
        for i in range(2 * w + 1):
            s = ti - w + i
            if 0 <= s < t:
                want_b[:, ti, i] = p[:, ti, s]
    np.testing.assert_allclose(got_b, want_b, atol=1e-6)


def test_banded_attention_matches_expansion_path(rng, tiny_model):
    """T>w (banded) must equal the reference-style expansion (T<=w path)
    computed via the textbook helpers on the same inputs."""
    from polgen_rvc_tpu.models.synthesizer import (
        _abs_to_rel, _rel_to_abs, _window_rel_embeddings, relative_attention,
    )
    import math as m

    cfg, params = tiny_model
    lp = params["enc_p"]["encoder"][0]["attn"]
    b, c, t = 1, cfg.hidden_channels, 24  # t > window (10)
    x = jnp.asarray(rng.standard_normal((b, c, t)).astype(np.float32))
    mask = jnp.ones((b, 1, t, t), jnp.float32)

    got = np.asarray(
        relative_attention(x, lp, n_heads=cfg.n_heads, window_size=10,
                           attn_mask=mask)
    )

    # reference-style expansion computed manually
    from polgen_rvc_tpu.ops.conv import conv1d as _c

    dk = c // cfg.n_heads
    q = _c(x, lp["q"]["w"], lp["q"]["b"]).reshape(b, cfg.n_heads, dk, t).swapaxes(2, 3)
    k = _c(x, lp["k"]["w"], lp["k"]["b"]).reshape(b, cfg.n_heads, dk, t).swapaxes(2, 3)
    v = _c(x, lp["v"]["w"], lp["v"]["b"]).reshape(b, cfg.n_heads, dk, t).swapaxes(2, 3)
    scale = 1.0 / m.sqrt(dk)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)
    rel_k = _window_rel_embeddings(jnp.asarray(lp["emb_rel_k"]), t, 10)
    scores = scores + _rel_to_abs(jnp.einsum("bhtd,xrd->bhtr", q * scale, rel_k))
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v)
    rel_v = _window_rel_embeddings(jnp.asarray(lp["emb_rel_v"]), t, 10)
    out = out + jnp.einsum("bhtr,xrd->bhtd", _abs_to_rel(p), rel_v)
    out = out.swapaxes(2, 3).reshape(b, c, t)
    want = np.asarray(_c(out, lp["o"]["w"], lp["o"]["b"]))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
