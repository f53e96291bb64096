"""Quantitative acceptance tests for the native effects chain.

The reference runs pedalboard (JUCE) effects in this exact order:
HighpassFilter -> Compressor -> NoiseGate -> Reverb -> LowShelfFilter ->
HighShelfFilter -> Chorus (reference rvc/scripts/audio_processing.py:76-109).
Our chain is first-party C++ (native/dsp.cpp). pedalboard is not
installable here, so each effect is pinned ANALYTICALLY instead:

- compressor: steady-state static gain curve out_db = thr + (in-thr)/ratio
- noise gate: full attenuation below threshold + release-time-constant
  envelope timing of the close
- freeverb: impulse response structure (pre-delay ~= shortest comb,
  sustained tail, decaying energy) and exact dry passthrough scaling
- shelves: measured magnitude response vs the RBJ cookbook closed form
  evaluated independently in numpy
- chorus: depth-0 chorus is an exact fractional delay line at the centre
  delay; mix blends it linearly

A pedalboard golden-diff harness sits at the bottom: it auto-skips here
and runs the full-chain comparison the moment an environment has
pedalboard installed.
"""

import numpy as np
import pytest

from polgen_rvc_tpu.app.audio_processing import EffectChain

SR = 44100

# settings that make every effect an exact (or near-exact) passthrough:
# ratio=1 dynamics apply 0 dB always; wet=0/dry=0.5 reverb is identity
# (freeverb's dry path gain is dry*2); gain=0 shelves are unity; mix=0
# chorus returns the input sample untouched. Only the fixed 50 Hz
# highpass remains — tests use frequencies >= 200 Hz where its gain
# deviates from unity by < 0.004 dB.
NEUTRAL = dict(
    reverb_rm_size=0.0, reverb_wet=0.0, reverb_dry=0.5, reverb_damping=0.0,
    reverb_width=1.0, low_shelf_gain=0.0, high_shelf_gain=0.0,
    compressor_ratio=1.0, compressor_threshold=0.0,
    noise_gate_threshold=-120.0, noise_gate_ratio=1.0,
    noise_gate_attack=1.0, noise_gate_release=100.0,
    chorus_rate_hz=1.0, chorus_depth=0.0, chorus_centre_delay_ms=7.0,
    chorus_feedback=0.0, chorus_mix=0.0,
)


def _stereo(x):
    return np.stack([x, x], axis=1).astype(np.float32)


def _sine(freq, seconds, amp, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _steady_amp(y, sr=SR, tail_s=0.3):
    """Steady-state sine amplitude from the trailing window (rms * sqrt2)."""
    tail = y[-int(tail_s * sr):, 0]
    return float(np.sqrt(2.0) * np.sqrt((tail ** 2).mean()))


def test_neutral_chain_is_passthrough():
    """Neutral settings leave only the fixed 50 Hz highpass: at 1 kHz its
    gain is unity to ~3e-6 but it still shifts phase by ~0.1 rad, so
    compare amplitude + spectral purity rather than raw waveforms."""
    x = _sine(1000.0, 0.5, 0.25)
    y = EffectChain(SR, **NEUTRAL).process(_stereo(x))
    assert abs(_steady_amp(y) / 0.25 - 1.0) < 1e-3
    # everything beyond a (possibly phase-shifted) 1 kHz sine is residue
    tail = y[-int(0.3 * SR):, 0].astype(np.float64)
    t = np.arange(tail.size) / SR
    basis = np.stack([np.sin(2 * np.pi * 1000 * t),
                      np.cos(2 * np.pi * 1000 * t)], axis=1)
    coef, *_ = np.linalg.lstsq(basis, tail, rcond=None)
    resid = tail - basis @ coef
    assert np.abs(resid).max() < 1e-4 * 0.25, np.abs(resid).max()


@pytest.mark.parametrize("in_db", [-30.0, -20.0, -12.0, -6.0])
def test_compressor_static_curve(in_db):
    """Steady sine above threshold compresses along the ratio line
    (threshold -20 dB, ratio 4): out_db = thr + (in_db - thr) / ratio;
    below threshold it passes at unity."""
    thr, ratio = -20.0, 4.0
    params = dict(NEUTRAL, compressor_ratio=ratio, compressor_threshold=thr)
    x = _sine(1000.0, 1.5, 10 ** (in_db / 20.0))
    y = EffectChain(SR, **params).process(_stereo(x))
    out_db = 20 * np.log10(_steady_amp(y))
    want_db = thr + (in_db - thr) / ratio if in_db > thr else in_db
    # the peak-riding envelope (1 ms attack / 100 ms release, pedalboard's
    # fixed times) sits within ~1 dB of the ideal static curve
    assert abs(out_db - want_db) < 1.5, (out_db, want_db)


def test_noise_gate_closes_below_threshold():
    """-20 dB passes untouched; -60 dB (below the -40 dB threshold) is
    attenuated by (env-thr)*(ratio-1) = -140 dB -> clamped to -80 dB,
    i.e. effectively silent."""
    params = dict(NEUTRAL, noise_gate_threshold=-40.0, noise_gate_ratio=8.0,
                  noise_gate_attack=10.0, noise_gate_release=100.0)
    loud = _sine(1000.0, 0.5, 10 ** (-20 / 20.0))
    quiet = _sine(1000.0, 1.5, 10 ** (-60 / 20.0))
    chain = EffectChain(SR, **params)
    y_loud = chain.process(_stereo(loud))
    y_quiet = chain.process(_stereo(quiet))
    assert abs(20 * np.log10(_steady_amp(y_loud)) - (-20.0)) < 0.5
    # steady-state closed-gate residual: -60 input - 80 floor = -140 dBFS
    assert _steady_amp(y_quiet) < 10 ** (-120 / 20.0)


def test_noise_gate_release_timing():
    """The gate closes on the envelope follower's release time constant:
    env decays from -20 toward -60 dB with tau = release_ms; the output
    crosses -6 dB of attenuation when (env+40)*(ratio-1) = -6, i.e. at
    t = tau * ln(40 / (20 - 6/7)) ~= 0.74 * tau. With release = 100 ms
    the crossing lands near 74 ms; assert the decade around it."""
    release_ms = 100.0
    params = dict(NEUTRAL, noise_gate_threshold=-40.0, noise_gate_ratio=8.0,
                  noise_gate_attack=1.0, noise_gate_release=release_ms)
    chain = EffectChain(SR, **params)
    chain.process(_stereo(_sine(1000.0, 0.5, 10 ** (-20 / 20.0))))
    y = chain.process(_stereo(_sine(1000.0, 1.0, 10 ** (-60 / 20.0))))[:, 0]
    # per-10ms-window amplitude envelope of the closing gate
    win = int(0.010 * SR)
    n_win = len(y) // win
    env = np.sqrt(2.0) * np.sqrt(
        (y[: n_win * win].reshape(n_win, win) ** 2).mean(axis=1)
    )
    env_db = 20 * np.log10(env + 1e-12)
    att = env_db - (-60.0)  # attenuation relative to the quiet input level
    cross = np.argmax(att < -6.0) * 0.010  # first window below -6 dB
    assert 0.02 <= cross <= 0.20, cross  # ~0.074 s predicted


def test_freeverb_impulse_response_structure():
    """Wet-only freeverb: silence before the shortest comb delay, energy
    for hundreds of ms after it, monotone-decaying tail."""
    params = dict(NEUTRAL, reverb_rm_size=0.5, reverb_wet=0.3,
                  reverb_dry=0.0, reverb_damping=0.5, reverb_width=1.0)
    x = np.zeros(SR, np.float32)
    x[0] = 1.0
    y = EffectChain(SR, **params).process(_stereo(x))[:, 0]
    # shortest comb is 1116 samples at 44.1k; the allpass chain passes its
    # first output straight through, so the IR must be silent before it
    assert np.abs(y[:1100]).max() < 1e-6
    assert np.abs(y[1116:1400]).max() > 1e-4
    e_early = float((y[int(0.05 * SR): int(0.15 * SR)] ** 2).sum())
    e_late = float((y[int(0.60 * SR): int(0.70 * SR)] ** 2).sum())
    assert e_early > 0 and e_late < e_early * 0.5, (e_early, e_late)
    # tail still audible at 300 ms (room 0.5 -> comb feedback 0.84)
    assert np.abs(y[int(0.30 * SR):int(0.40 * SR)]).max() > 1e-5


def test_freeverb_dry_scaling_exact():
    """freeverb's dry path is dry_level * 2 exactly (original freeverb
    scaling, which pedalboard keeps); with wet=0 the chain is a pure
    dry-gain on the input."""
    for dry, want_gain in [(0.5, 1.0), (0.8, 1.6)]:
        params = dict(NEUTRAL, reverb_dry=dry)
        x = _sine(1000.0, 0.3, 0.1)
        y = EffectChain(SR, **params).process(_stereo(x))
        got = _steady_amp(y) / 0.1
        assert abs(got - want_gain) < 1e-3, (dry, got, want_gain)


def _rbj_shelf_mag(freq, fs, fc, gain_db, q, high):
    """RBJ cookbook shelf magnitude, computed independently in numpy."""
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * np.pi * fc / fs
    cw, sw = np.cos(w0), np.sin(w0)
    alpha = sw / (2 * q)
    tsa = 2 * np.sqrt(A) * alpha
    if not high:
        b0 = A * ((A + 1) - (A - 1) * cw + tsa)
        b1 = 2 * A * ((A - 1) - (A + 1) * cw)
        b2 = A * ((A + 1) - (A - 1) * cw - tsa)
        a0 = (A + 1) + (A - 1) * cw + tsa
        a1 = -2 * ((A - 1) + (A + 1) * cw)
        a2 = (A + 1) + (A - 1) * cw - tsa
    else:
        b0 = A * ((A + 1) + (A - 1) * cw + tsa)
        b1 = -2 * A * ((A - 1) + (A + 1) * cw)
        b2 = A * ((A + 1) + (A - 1) * cw - tsa)
        a0 = (A + 1) - (A - 1) * cw + tsa
        a1 = 2 * ((A - 1) - (A + 1) * cw)
        a2 = (A + 1) - (A - 1) * cw - tsa
    z = np.exp(-1j * 2 * np.pi * freq / fs)
    h = (b0 + b1 * z + b2 * z * z) / (a0 + a1 * z + a2 * z * z)
    return float(np.abs(h))


@pytest.mark.parametrize("gain_db,high", [(12.0, False), (-9.0, False),
                                          (12.0, True), (-9.0, True)])
def test_shelf_magnitude_matches_rbj_closed_form(gain_db, high):
    """Measured per-frequency gain of the 440 Hz shelves equals the RBJ
    cookbook closed form within 0.15 dB (chain corner: also divide out the
    50 Hz highpass's analytic response at the lowest test frequency)."""
    key = "high_shelf_gain" if high else "low_shelf_gain"
    params = dict(NEUTRAL, **{key: gain_db})
    for freq in (200.0, 440.0, 2000.0, 8000.0):
        x = _sine(freq, 1.0, 0.05)
        y = EffectChain(SR, **params).process(_stereo(x))
        got = _steady_amp(y) / 0.05
        want = _rbj_shelf_mag(freq, SR, 440.0, gain_db, 0.70710678, high)
        # fixed 50 Hz butterworth highpass in the chain (pedalboard default)
        w = freq / 50.0
        want *= w * w / np.sqrt(1.0 + w ** 4)
        got_db, want_db = 20 * np.log10(got), 20 * np.log10(want)
        assert abs(got_db - want_db) < 0.15, (freq, got_db, want_db)


def test_chorus_is_exact_fractional_delay_at_depth_zero():
    """depth=0, feedback=0, mix=1 reduces the chorus to a pure delay at
    centre_delay_ms; an impulse comes out exactly there."""
    delay_ms = 10.0
    params = dict(NEUTRAL, chorus_rate_hz=1.0, chorus_depth=0.0,
                  chorus_centre_delay_ms=delay_ms, chorus_feedback=0.0,
                  chorus_mix=1.0)
    x = np.zeros(4096, np.float32)
    x[0] = 0.5
    y = EffectChain(SR, **params).process(_stereo(x))[:, 0]
    want_at = int(round(delay_ms * 1e-3 * SR))  # 441 samples
    assert abs(int(np.argmax(np.abs(y))) - want_at) <= 1
    assert np.abs(y[want_at]) > 0.4
    # mix=0.5 blends dry and delayed equally
    params["chorus_mix"] = 0.5
    y2 = EffectChain(SR, **params).process(_stereo(x))[:, 0]
    # the impulse reaches the chorus scaled by the 50 Hz highpass's
    # b0 = 0.99497 at 44.1 kHz; both the dry and delayed halves carry it
    b0_hp = (1 + np.cos(2 * np.pi * 50 / SR)) / 2 / (
        1 + np.sin(2 * np.pi * 50 / SR) / (2 * 0.70710678)
    )
    want = 0.25 * b0_hp
    assert abs(y2[0] - want) < 1e-3 and abs(y2[want_at] - want) < 1e-2


def test_pedalboard_golden_diff():
    """Full-chain comparison against the reference's actual DSP engine.
    Skips when pedalboard isn't installed (it can't be here: zero egress);
    run it in any environment that has it."""
    pedalboard = pytest.importorskip("pedalboard")

    sr = SR
    rng = np.random.default_rng(0)
    t = np.arange(2 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 931 * t)
         + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    stereo = np.stack([x, x], axis=1)

    kw = dict(reverb_rm_size=0.4, reverb_wet=0.2, reverb_dry=0.7,
              reverb_damping=0.6, reverb_width=0.9,
              low_shelf_gain=3.0, high_shelf_gain=-2.0,
              compressor_ratio=4.0, compressor_threshold=-16.0,
              noise_gate_threshold=-40.0, noise_gate_ratio=6.0,
              noise_gate_attack=10.0, noise_gate_release=100.0,
              chorus_rate_hz=1.2, chorus_depth=0.25,
              chorus_centre_delay_ms=7.0, chorus_feedback=0.2,
              chorus_mix=0.3)
    ours = EffectChain(sr, **kw).process(stereo)

    board = pedalboard.Pedalboard([
        pedalboard.HighpassFilter(),
        pedalboard.Compressor(ratio=kw["compressor_ratio"],
                              threshold_db=kw["compressor_threshold"]),
        pedalboard.NoiseGate(threshold_db=kw["noise_gate_threshold"],
                             ratio=kw["noise_gate_ratio"],
                             attack_ms=kw["noise_gate_attack"],
                             release_ms=kw["noise_gate_release"]),
        pedalboard.Reverb(room_size=kw["reverb_rm_size"],
                          wet_level=kw["reverb_wet"],
                          dry_level=kw["reverb_dry"],
                          damping=kw["reverb_damping"],
                          width=kw["reverb_width"]),
        pedalboard.LowShelfFilter(gain_db=kw["low_shelf_gain"]),
        pedalboard.HighShelfFilter(gain_db=kw["high_shelf_gain"]),
        pedalboard.Chorus(rate_hz=kw["chorus_rate_hz"],
                          depth=kw["chorus_depth"],
                          centre_delay_ms=kw["chorus_centre_delay_ms"],
                          feedback=kw["chorus_feedback"],
                          mix=kw["chorus_mix"]),
    ])
    theirs = board(stereo.T, sr).T

    # energy-normalized L2 difference over the full signal: the chains
    # share topology; residual differences are envelope-detector and
    # interpolation details
    num = float(((ours - theirs) ** 2).sum())
    den = float((theirs ** 2).sum()) + 1e-12
    assert num / den < 0.05, num / den
