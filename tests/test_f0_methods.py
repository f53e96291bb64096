"""CREPE + FCPE models and method glue (synthetic weights, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polgen_rvc_tpu.convert.crepe_ckpt import convert_crepe_state, make_crepe_state
from polgen_rvc_tpu.convert.fcpe_ckpt import convert_fcpe_state, make_fcpe_state
from polgen_rvc_tpu.models.crepe import (
    crepe_f0_decode,
    crepe_frames,
    crepe_salience,
    viterbi_path,
)
from polgen_rvc_tpu.models.fcpe import (
    fcpe_decode,
    fcpe_mel,
    fcpe_post_process,
    fcpe_salience,
)


def test_crepe_frames_shape_and_norm(rng):
    audio = rng.standard_normal((1, 16000)).astype(np.float32)
    hop = 160
    frames = np.asarray(crepe_frames(jnp.asarray(audio), hop))
    assert frames.shape == (1, 1 + 16000 // hop, 1024)
    np.testing.assert_allclose(frames.mean(-1), 0, atol=1e-4)


def test_crepe_salience_shape(rng):
    params = convert_crepe_state(make_crepe_state(seed=0))
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    sal = np.asarray(crepe_salience(params, jnp.asarray(frames)))
    assert sal.shape == (4, 360)
    assert np.all((sal >= 0) & (sal <= 1))


def test_viterbi_prefers_smooth_paths():
    t = 30
    probs = np.full((t, 360), 1e-3)
    probs[:, 100] = 0.5
    probs[10, 300] = 0.9  # single-frame outlier: transition cost must veto it
    path = viterbi_path(probs)
    assert np.all(np.abs(np.diff(path)) <= 11)
    assert path[10] != 300
    f0 = crepe_f0_decode(probs, f0_min=50, f0_max=1100)
    assert f0.shape == (t,)


def test_viterbi_banded_native_matches_dense(rng):
    """native/viterbi.cpp must reproduce the dense numpy recursion exactly —
    paths bit-identical, including masked-bin plateaus (all-tie frames) where
    the out-of-band log(1e-20) 'teleport' transitions decide backpointers."""
    from polgen_rvc_tpu.models.crepe import viterbi_path_dense

    for trial in range(4):
        t = 240
        probs = rng.random((t, 360)) * 0.01
        c = np.clip(100 + np.cumsum(rng.integers(-3, 4, t)), 0, 359)
        probs[np.arange(t), c] = 0.9
        probs[:, :40] = 0.0    # f0_min-style mask
        probs[:, 300:] = 0.0   # f0_max-style mask
        if trial % 2:
            probs[80:100, :] = 0.0  # fully-masked frames: every bin ties
        np.testing.assert_array_equal(
            viterbi_path(probs), viterbi_path_dense(probs)
        )
        # float32-exact values route through the inline-normalization C++
        # entry (polgen_viterbi_banded_probs) — same contract
        p32 = probs.astype(np.float32).astype(np.float64)
        np.testing.assert_array_equal(
            viterbi_path(p32), viterbi_path_dense(p32)
        )


def _viterbi_score_f64(path, probs):
    """f64 total log-score of a path under the dense formulation — the
    ground truth both decoders optimize."""
    from polgen_rvc_tpu.models.crepe import _transition_matrix, _viterbi_prep

    log_trans, log_obs = _viterbi_prep(probs, 12)
    s = np.log(1.0 / 360) + log_obs[0, path[0]]
    for t in range(1, len(path)):
        s += log_trans[path[t - 1], path[t]] + log_obs[t, path[t]]
    return s


def test_viterbi_device_matches_host(rng):
    """The lax.scan device Viterbi (f32, per-step renorm) must reproduce
    the host recursion's paths wherever the salience has structure; on
    all-tie plateau frames (synthetic-only: bin masking can't zero
    in-range sigmoid salience) it may break the exact tie differently,
    but the path it picks must have the SAME f64 total cost — an equally
    optimal decode. Rows t >= n are pass-through padding."""
    from polgen_rvc_tpu.models.crepe import viterbi_path_device

    for trial in range(4):
        t = 240
        probs = rng.random((t, 360)) * 0.01
        c = np.clip(100 + np.cumsum(rng.integers(-3, 4, t)), 0, 359)
        probs[np.arange(t), c] = 0.9
        probs[:, :40] = 0.0
        probs[:, 300:] = 0.0
        plateau = trial % 2
        if plateau:
            probs[80:100, :] = 0.0  # fully-masked frames: every bin ties
        p32 = probs.astype(np.float32)
        obs = p32 / np.maximum(p32.sum(1, keepdims=True), 1e-20)
        log_obs = np.log(obs + 1e-20).astype(np.float32)
        path_h = viterbi_path(p32.astype(np.float64))
        # padded run: garbage rows past n must not affect the decode
        pad_rows = rng.random((16, 360)).astype(np.float32)
        lo_pad = np.concatenate([log_obs, np.log(pad_rows + 1e-20)])
        path_d = np.asarray(
            viterbi_path_device(jnp.asarray(lo_pad), jnp.int32(t))
        )
        assert np.all(path_d[t:] == path_d[t - 1])  # identity tail
        path_d = path_d[:t]
        if not plateau:
            np.testing.assert_array_equal(path_d, path_h)
        else:
            # differences confined to the equal-cost plateau block
            mism = np.nonzero(path_d != path_h)[0]
            assert np.all((mism >= 80) & (mism < 101)), mism
            p64 = p32.astype(np.float64)
            np.testing.assert_allclose(
                _viterbi_score_f64(path_d, p64),
                _viterbi_score_f64(path_h, p64), rtol=1e-12,
            )


def test_viterbi_pallas_matches_scan(rng):
    """ops/pallas_viterbi.py must reproduce viterbi_path_device
    BIT-identically (same f32 arithmetic in the same order — only the op
    scheduling differs), including adversarial all-tie plateaus, garbage
    rows past n, T not a multiple of the block, and the dp carry across
    grid blocks (small blk forces multi-block runs)."""
    from polgen_rvc_tpu.models.crepe import viterbi_path_device
    from polgen_rvc_tpu.ops.pallas_viterbi import viterbi_path_pallas

    for trial, (t, n, blk) in enumerate(
        ((240, 240, 64), (240, 224, 64), (130, 111, 64), (64, 64, 64))
    ):
        probs = rng.random((t, 360)).astype(np.float32) * 0.01
        c = np.clip(100 + np.cumsum(rng.integers(-3, 4, t)), 0, 359)
        probs[np.arange(t), c] = 0.9
        probs[:, :40] = 0.0
        probs[:, 300:] = 0.0
        if trial % 2:
            probs[50:70, :] = 0.0  # fully-masked frames: every bin ties
        if n < t:  # garbage past n must be pass-through
            probs[n:] = rng.random((t - n, 360)).astype(np.float32)
        obs = probs / np.maximum(probs.sum(1, keepdims=True), 1e-20)
        log_obs = jnp.asarray(np.log(obs + 1e-20).astype(np.float32))
        want = np.asarray(viterbi_path_device(log_obs, jnp.int32(n)))
        got = np.asarray(viterbi_path_pallas(
            log_obs, jnp.int32(n), interpret=True, blk=blk
        ))
        np.testing.assert_array_equal(got, want)


def test_crepe_resize_device_matches_host():
    """crepe_resize_device must mirror the reference post exactly: nan
    gating below 0.001, np.interp from n frames onto the i*n/p_len grid
    (incl. exact-grid-hit nan semantics and right-edge clamp), nan -> 0,
    zero past p_len."""
    from polgen_rvc_tpu.models.crepe import crepe_resize_device

    rng = np.random.default_rng(1)
    for n, p_len in ((50, 80), (80, 50), (64, 64), (1, 10), (10, 1),
                     (33, 97)):
        f0 = (100.0 + 50.0 * rng.random(n)).astype(np.float32)
        f0[rng.random(n) < 0.25] = 0.0  # sub-threshold -> nan on host
        source = f0.astype(np.float64).copy()
        source[source < 0.001] = np.nan
        target = np.interp(
            np.arange(0, len(source) * p_len, len(source)) / p_len,
            np.arange(0, len(source)), source,
        )
        host = np.nan_to_num(target).astype(np.float32)
        out_size = max(p_len, n) + 7
        dev = np.asarray(crepe_resize_device(
            jnp.asarray(f0), jnp.int32(n), jnp.int32(p_len), out_size
        ))
        np.testing.assert_allclose(dev[:p_len], host, rtol=1e-5, atol=1e-4)
        assert np.all(dev[p_len:] == 0)


def test_crepe_device_path_matches_host(rng):
    """The device-resident crepe F0 (fused salience slabs + scan Viterbi +
    resize + shift + coarse) must track the host glue: same salience
    slabs feed both, so differences are only f32-vs-f64 decode rounding."""
    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
        with_crepe=True,
    )
    t = np.arange(16000 * 3) / 16000
    audio = (0.4 * np.sin(
        2 * np.pi * 220 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)) * t
    )).astype(np.float32)
    opts = ConversionOptions(f0_method="mangio-crepe", pitch=2,
                             hop_length=160)
    _, uploaded, _, plan = vc._upload_preamble(audio)
    p_len = plan.padded_audio.shape[0] // vc.engine.window

    dev = vc.compute_f0_device(plan.padded_audio, p_len, opts, uploaded)
    assert dev is not None, "crepe device path did not engage"
    pitch_d = np.asarray(dev[0])[0, :p_len]
    pitchf_d = np.asarray(dev[1])[0, :p_len]
    pitch_h, pitchf_h = vc.compute_f0(plan.padded_audio, p_len, opts)

    rel = np.abs(pitchf_d - pitchf_h) / np.maximum(np.abs(pitchf_h), 1.0)
    assert np.median(rel) < 1e-4
    assert np.mean(rel < 1e-2) > 0.98, f"crepe device/host diverge: {rel.max()}"
    assert np.mean(pitch_d == pitch_h) > 0.98


def test_fcpe_salience_mask_invariant(rng):
    """fcpe_salience(n_valid=n) on a bucket-padded mel must equal the
    true-length run on frames [0, n): GroupNorm stats, FAVOR+ sums, and
    boundary conv windows all see the reference's unpadded tensor."""
    cfg, sd = make_fcpe_state(tiny=True, seed=0)
    params = convert_fcpe_state(sd, cfg)
    mel = (rng.standard_normal((1, 96, cfg.input_channel)) * 0.5).astype(
        np.float32
    )
    full = np.asarray(fcpe_salience(params, cfg, jnp.asarray(mel)))
    junk = rng.standard_normal((1, 64, cfg.input_channel)).astype(np.float32)
    padded = np.concatenate([mel, junk], axis=1)
    masked = np.asarray(
        fcpe_salience(params, cfg, jnp.asarray(padded), n_valid=jnp.int32(96))
    )
    np.testing.assert_allclose(masked[:, :96], full, atol=2e-5)


def test_fcpe_device_path_matches_host(rng):
    """The fused device-resident FCPE graph (mel + salience + decode +
    resize/gap-fill + shift + coarse in one jit) must track the host glue:
    identical except for int16-upload quantization (-96 dB) and the
    zero-vs-reflect padded bucket tail (frames inside the trimmed x_pad)."""
    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
        with_fcpe=True,
    )
    t = np.arange(16000 * 3) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)) * t)
             ).astype(np.float32)
    opts = ConversionOptions(f0_method="fcpe", pitch=2)
    _, uploaded, _, plan = vc._upload_preamble(audio)
    p_len = plan.padded_audio.shape[0] // vc.engine.window

    dev = vc.compute_f0_device(plan.padded_audio, p_len, opts, uploaded)
    assert dev is not None, "fcpe device path did not engage"
    pitch_d = np.asarray(dev[0])[0, :p_len]
    pitchf_d = np.asarray(dev[1])[0, :p_len]
    pitch_h, pitchf_h = vc.compute_f0(plan.padded_audio, p_len, opts)

    # compare away from the bucket tail (inside p_len everything is real
    # signal; the last ~win/hop frames see zero- vs reflect-padding)
    n_cmp = p_len - 10
    rel = np.abs(pitchf_d[:n_cmp] - pitchf_h[:n_cmp]) / np.maximum(
        np.abs(pitchf_h[:n_cmp]), 1.0
    )
    assert np.median(rel) < 1e-4
    assert np.mean(rel < 1e-2) > 0.95, f"fcpe device/host diverge: {rel.max()}"
    assert np.mean(pitch_d[:n_cmp] == pitch_h[:n_cmp]) > 0.95


def test_fcpe_mel_and_salience(rng):
    cfg, sd = make_fcpe_state(tiny=True, seed=0)
    params = convert_fcpe_state(sd, cfg)
    audio = rng.standard_normal((1, 16000)).astype(np.float32)
    mel = fcpe_mel(jnp.asarray(audio), cfg)
    assert mel.shape == (1, 16000 // cfg.hop_size + 1, cfg.num_mels)
    sal = np.asarray(fcpe_salience(params, cfg, mel))
    assert sal.shape == (1, mel.shape[1], 360)
    assert np.all((sal >= 0) & (sal <= 1))
    f0 = np.asarray(fcpe_decode(jnp.asarray(sal), cfg, 0.03))
    assert f0.shape == (1, mel.shape[1])
    assert np.all(f0 >= 0)


def test_fcpe_post_process_fills_gaps():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0, 0], np.float32)
    out = fcpe_post_process(f0, 8, 160, 16000)
    assert out.shape == (8,)
    assert np.all(out > 0)  # gaps interpolated / edge-extended
    np.testing.assert_allclose(out[2], 100, rtol=1e-5)
    assert out[0] == 100 and out[-1] == 200  # edge extension


def test_fcpe_post_process_degenerate():
    assert np.all(fcpe_post_process(np.zeros(5, np.float32), 7, 160, 16000) == 0)
    out = fcpe_post_process(np.array([0, 150.0, 0], np.float32), 5, 160, 16000)
    np.testing.assert_allclose(out, 150.0)


def test_fcpe_resize_fill_long_audio_no_int32_wrap():
    """fcpe_resize_fill's floor((i*n)/p_len) must stay exact where i*n
    overflows int32 (n >= ~46341 frames, ~7.7 min at 16 kHz): a naive
    (i * n) // p_len wraps and silently maps late output frames to wrong
    source frames. The index must match an int64 host computation."""
    from polgen_rvc_tpu.models.fcpe import fcpe_resize_fill

    # identity case: n == p_len == 50000 -> src must be exactly arange(n),
    # including frames past i*n >= 2**31 (i >= 6554 here)
    n = p_len = 50000
    size = 50176
    f0 = np.arange(1, size + 1, dtype=np.float32)  # strictly positive: no gaps
    out = np.asarray(fcpe_resize_fill(
        jnp.asarray(f0), jnp.int32(n), jnp.int32(p_len)
    ))
    np.testing.assert_array_equal(out[:p_len], f0[:p_len])
    assert np.all(out[p_len:] == 0)

    # non-identity resize at wrap-prone magnitudes vs exact int64 indices
    n, p_len, size = 46000, 60000, 60160
    f0 = np.arange(1, size + 1, dtype=np.float32)
    out = np.asarray(fcpe_resize_fill(
        jnp.asarray(f0), jnp.int32(n), jnp.int32(p_len)
    ))
    src = np.clip(
        (np.arange(size, dtype=np.int64) * n) // p_len, 0, n - 1
    )
    np.testing.assert_array_equal(out[:p_len], f0[src[:p_len]])


def test_crepe_f16_wire_coarse_bins_bounded(rng):
    """The f16 wire format of the crepe salience slabs
    (pipeline/f0_dispatch.py) must be inaudible at PIPELINE semantics: the
    coarse mel-quantized bins the synthesizer embeds
    (reference pipeline.py:193-201) may differ from an f32-slab decode only
    by bounded flips. Bound derivation: f16 rounding perturbs sigmoid
    salience by <= 2^-11 relative; through the +-4-bin weighted cents
    average that moves cents by <~ 0.1 (rel f0 <~ 1e-4), except where the
    Viterbi path flips a whole 20-cent bin on an f16-created near-tie —
    a 1.2e-2 rel jump, <= 2 coarse-bin steps (3.885 mel/step, a 20-cent
    flip at 1100 Hz moves <= 7.4 mel)."""
    from polgen_rvc_tpu.models.crepe import (
        crepe_f0_decode, crepe_salience_window,
    )
    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.crepe_method import _FRAME_BUCKET
    from polgen_rvc_tpu.pipeline.f0_dispatch import coarse_f0_np
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
        with_crepe=True,
    )
    t = np.arange(16000 * 3) / 16000
    audio = (0.4 * np.sin(
        2 * np.pi * 220 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)) * t
    ) + 0.005 * rng.standard_normal(t.size)).astype(np.float32)
    opts = ConversionOptions(f0_method="mangio-crepe", pitch=2,
                             hop_length=160)
    _, uploaded, _, plan = vc._upload_preamble(audio)
    p_len = plan.padded_audio.shape[0] // vc.engine.window
    audio_dev, inv_scale, tt = uploaded
    n = tt // int(opts.hop_length) + 1

    sal32 = np.concatenate([
        np.asarray(crepe_salience_window(
            vc.crepe_params, audio_dev, inv_scale, jnp.int32(s),
            jnp.int32(opts.hop_length), _FRAME_BUCKET,
        ))
        for s in range(0, int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET,
                       _FRAME_BUCKET)
    ])[:n]
    assert sal32.dtype == np.float32

    shift = 2.0 ** (opts.pitch / 12.0)
    tracks = {}
    for name, sal in (("f32", sal32), ("f16", sal32.astype(np.float16))):
        f0 = crepe_f0_decode(sal, f0_min=opts.f0_min, f0_max=opts.f0_max)
        source = f0.astype(np.float64)
        source[source < 0.001] = np.nan
        target = np.interp(
            np.arange(0, len(source) * p_len, len(source)) / p_len,
            np.arange(0, len(source)), source,
        )
        pitchf = np.nan_to_num(target).astype(np.float32) * shift
        tracks[name] = (pitchf, coarse_f0_np(pitchf.copy(), opts.f0_min,
                                             opts.f0_max))

    pf32, c32 = tracks["f32"]
    pf16, c16 = tracks["f16"]
    rel = np.abs(pf16 - pf32) / np.maximum(np.abs(pf32), 1.0)
    assert np.median(rel) < 2e-4, np.median(rel)
    assert np.mean(rel < 2e-2) > 0.98, rel.max()  # path flips only
    d = np.abs(c16.astype(np.int64) - c32.astype(np.int64))
    assert d.max() <= 2, d.max()
    assert np.mean(d == 0) > 0.95, np.mean(d == 0)

    # production TPU combo: bf16 conv multiplicands (f32 accumulate,
    # crepe_salience compute_dtype) + the f16 wire. bf16 rounds each
    # multiplicand to 8 mantissa bits -> ~1e-2 relative on salience, so
    # the ±4-bin cents average moves a few cents (rel f0 ~1e-3) and
    # near-tie Viterbi flips (20 cents, 1.2e-2 rel, <= 2 coarse steps)
    # get more frequent — still inside the reference's fp16-GPU envelope.
    from polgen_rvc_tpu.models.crepe import crepe_f0_decode as _dec

    sal_bf = np.concatenate([
        np.asarray(crepe_salience_window(
            vc.crepe_params, audio_dev, inv_scale, jnp.int32(s),
            jnp.int32(opts.hop_length), _FRAME_BUCKET,
            compute_dtype=jnp.bfloat16,
        ))
        for s in range(0, int(np.ceil(n / _FRAME_BUCKET)) * _FRAME_BUCKET,
                       _FRAME_BUCKET)
    ])[:n].astype(np.float16)
    f0 = _dec(sal_bf, f0_min=opts.f0_min, f0_max=opts.f0_max)
    source = f0.astype(np.float64)
    source[source < 0.001] = np.nan
    target = np.interp(
        np.arange(0, len(source) * p_len, len(source)) / p_len,
        np.arange(0, len(source)), source,
    )
    pf_bf = np.nan_to_num(target).astype(np.float32) * shift
    c_bf = coarse_f0_np(pf_bf.copy(), opts.f0_min, opts.f0_max)
    rel = np.abs(pf_bf - pf32) / np.maximum(np.abs(pf32), 1.0)
    assert np.median(rel) < 3e-3, np.median(rel)
    assert np.mean(rel < 2e-2) > 0.95, np.mean(rel < 2e-2)
    d = np.abs(c_bf.astype(np.int64) - c32.astype(np.int64))
    assert d.max() <= 3, d.max()
    assert np.mean(d <= 1) > 0.95, np.mean(d <= 1)


def test_engine_crepe_and_fcpe_methods(rng):
    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    vc = build_synthetic_converter(
        tiny=True, sr=48000,
        engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                            chunk_batch=1, bucket_step_s=2),
    )
    vc.crepe_params = jax.tree.map(
        jnp.asarray, convert_crepe_state(make_crepe_state(seed=1))
    )
    fcfg, fsd = make_fcpe_state(tiny=True, seed=2)
    vc.fcpe_params = jax.tree.map(jnp.asarray, convert_fcpe_state(fsd, fcfg))
    vc.fcpe_cfg = fcfg

    t = np.arange(32000) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for method in ("mangio-crepe", "fcpe"):
        out, sr = vc.convert(
            audio, ConversionOptions(f0_method=method, hop_length=160)
        )
        assert sr == 48000 and len(out) > 0, method


def test_prewarm_zero_recompile_fcpe_and_crepe(rng):
    """VERDICT r3 #4: the fcpe/mangio-crepe paths must be prewarmable too —
    after prewarm() with those methods, a convert() builds no new graphs
    and recompiles nothing (salience graph included)."""
    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    t = np.arange(16000 * 5) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for method, store in (("fcpe", "_fcpe_fns"), ("mangio-crepe", "_crepe_fns")):
        vc = build_synthetic_converter(
            tiny=True, sr=48000,
            engine=EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                                chunk_batch=1, bucket_step_s=2),
            with_crepe=True, with_fcpe=True,
        )
        opts = ConversionOptions(f0_method=method, hop_length=160)
        vc.prewarm(audio, opts)
        keys = {
            name: set(getattr(vc, name))
            for name in ("_chunk_fns", "_f0_fns", "_trim_fns",
                         "_fcpe_fns", "_crepe_fns", "_crepe_dec_fns")
        }
        assert keys[store], f"{method} salience graph was not prewarmed"
        sizes = {
            k: vc._chunk_fns[k][0]._jitted._cache_size()
            for k in keys["_chunk_fns"]
        }
        vc.convert(audio, opts)
        for name, want in keys.items():
            assert set(getattr(vc, name)) == want, (method, name)
        for k, n in sizes.items():
            assert vc._chunk_fns[k][0]._jitted._cache_size() == n, (method, k)


def test_rmvpe_decode_fp32_pinned_and_tie_deterministic():
    """VERDICT r3 #7 (decode half): the decode upcasts its input to fp32
    — a caller handing it bf16 salience gets fp32 window math, not bf16 —
    and EXACT ties break deterministically toward the lower bin (the
    reference's np.argmax first-index semantics), so equal-value salience
    can never flip with backend reduction order."""
    from polgen_rvc_tpu.ops.f0_utils import bin_cents_table, local_average_cents

    rng = np.random.default_rng(0)
    frames, want_center = [], []
    for pos in (5, 100, 180, 250, 350):
        for dist in (1, 37):
            base = rng.uniform(0.0, 0.002, 360).astype(np.float32)
            s = base.copy()
            other = (pos + dist) % 360
            s[pos] = s[other] = np.float32(0.9)  # exact tie
            frames.append(s)
            want_center.append(min(pos, other))
    sal = np.stack(frames)
    cents = np.asarray(local_average_cents(jnp.asarray(sal)))
    table = bin_cents_table()
    # the decoded value must be the ±4-bin weighted mean AROUND THE LOWER
    # tied bin: adjacent ties average to ~the midpoint (+10 cents); a
    # distant-tie flip would land ~740 cents away at the higher bin, so
    # 15 cents separates correct from flipped decisively
    for c, w in zip(cents, want_center):
        assert abs(c - table[w]) < 15.0, (c, table[w])
    # bf16 input gets upcast: same centers as the identical fp32 values
    cents_bf = np.asarray(local_average_cents(
        jnp.asarray(sal).astype(jnp.bfloat16)
    ))
    for c, w in zip(cents_bf, want_center):
        assert abs(c - table[w]) < 15.0, (c, table[w])


def test_f0_path_is_compute_dtype_invariant():
    """VERDICT r3 #7 (engine half): the engine's F0 graph is pinned fp32
    end-to-end, so the engine compute_dtype (bf16 on TPU for the rest of
    the pipeline) CANNOT flip RMVPE decode bins — pitch/pitchf from a
    bf16-engine and a fp32-engine must be bit-identical."""
    import dataclasses as dc

    from polgen_rvc_tpu.pipeline import ConversionOptions, EngineConfig
    from polgen_rvc_tpu.pipeline.factory import build_synthetic_converter

    eng = EngineConfig(x_pad=1, x_query=2, x_center=6, x_max=8,
                       chunk_batch=1, bucket_step_s=2)
    t = np.arange(16000 * 4) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * (
        t + 0.002 * np.sin(2 * np.pi * 5 * t)
    )) + 0.01 * np.random.default_rng(3).standard_normal(t.size)
    ).astype(np.float32)
    opts = ConversionOptions()
    outs = {}
    for cdt in ("float32", "bfloat16"):
        vc = build_synthetic_converter(
            tiny=True, sr=48000, engine=dc.replace(eng, compute_dtype=cdt),
        )
        p_len = (len(audio) + 2 * eng.t_pad) // eng.window
        pad = np.pad(audio, (eng.t_pad, eng.t_pad), mode="reflect")
        outs[cdt] = vc.compute_f0(pad, p_len, opts)
    np.testing.assert_array_equal(outs["float32"][0], outs["bfloat16"][0])
    np.testing.assert_array_equal(outs["float32"][1], outs["bfloat16"][1])
