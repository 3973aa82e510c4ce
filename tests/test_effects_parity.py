"""Device effects chain vs host scipy oracles.

The chain itself (open_speech_tpu/audio/effects.py + ops/effects.py) is
XLA-only; scipy appears here purely as an independent oracle so the
associative-scan biquads, FFT reverb and parallel phase vocoder are pinned
to reference-equivalent numerics (reference behavior: src/effects/chain.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy import signal

from open_speech_tpu.audio import effects
from open_speech_tpu.ops import effects as fx

SR = 24000


def _voiceish(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = 0.2 * np.sin(2 * np.pi * 180 * t) + 0.1 * np.sin(2 * np.pi * 950 * t)
    x += 0.02 * rng.standard_normal(n)
    return x.astype(np.float32)


# ── filter design matches scipy's ─────────────────────────────────────


def test_highpass_design_matches_scipy_butter():
    b, a = fx.design_highpass_biquad(80.0, SR)
    b_ref, a_ref = signal.butter(2, 80 / (SR / 2), btype="high")
    np.testing.assert_allclose(b, b_ref, rtol=1e-12)
    np.testing.assert_allclose(a, a_ref, rtol=1e-12)


def test_peak_design_matches_scipy_iirpeak():
    b, a = fx.design_peak_biquad(3000.0, 2.0, SR)
    b_ref, a_ref = signal.iirpeak(3000 / (SR / 2), Q=2)
    np.testing.assert_allclose(b, b_ref, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a, a_ref, rtol=1e-12)


# ── device kernels vs scipy execution ─────────────────────────────────


def test_biquad_scan_matches_lfilter():
    x = _voiceish()
    out = np.asarray(effects.apply_chain(x, SR, [{"type": "podcast_eq"}]))
    ref = x.astype(np.float64)
    for design in (
        fx.design_highpass_biquad(80.0, SR),
        fx.design_peak_biquad(3000.0, 2.0, SR),
    ):
        ref = signal.lfilter(*design, ref)
    # f32 log-depth scan vs f64 serial recursion: agreement to ~1e-4 of
    # full scale is numerical noise, not algorithmic drift
    assert np.max(np.abs(out - ref)) < 2e-4
    assert out.shape == x.shape


def test_reverb_matches_fftconvolve():
    x = _voiceish()
    room, mix = "medium", 0.4
    out = np.asarray(effects.apply_chain(x, SR, [{"type": "reverb", "room": room}]))
    ir = np.exp(-np.linspace(0, 6, int(SR * 120 / 1000)))
    ir /= ir.sum()
    wet = signal.fftconvolve(x.astype(np.float64), ir)[: len(x)]
    ref = (1 - mix) * x + mix * wet
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_normalize_masked_rms_exact():
    x = 0.03 * _voiceish()
    out = effects.apply_chain(x, SR, [{"type": "normalize", "target_lufs": -20}])
    rms = np.sqrt(np.mean(out.astype(np.float64) ** 2))
    assert abs(rms - 10 ** (-20 / 20)) < 1e-4
    # silence passes through unscaled
    z = np.zeros(5000, np.float32)
    assert np.array_equal(effects.apply_chain(z, SR, [{"type": "normalize"}]), z)


def test_robot_is_exact_carrier_product():
    x = _voiceish(8000)
    out = effects.apply_chain(x, SR, [{"type": "robot"}])
    t = np.arange(len(x), dtype=np.float32) / SR
    np.testing.assert_allclose(out, x * np.sin(2 * np.pi * 100 * t), atol=1e-5)


@pytest.mark.parametrize("semitones,f0", [(12, 220.0), (-5, 330.0), (3.5, 250.0)])
def test_pitch_shift_frequency_ratio(semitones, f0):
    n = SR  # 1 s
    t = np.arange(n) / SR
    x = (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    out = effects.apply_chain(x, SR, [{"type": "pitch", "semitones": semitones}])
    assert len(out) == n
    spec = np.abs(np.fft.rfft(out * np.hanning(n)))
    peak_hz = np.argmax(spec) * SR / n
    want = f0 * 2 ** (semitones / 12)
    assert abs(peak_hz - want) < 0.03 * want
    # energy survives the vocoder round trip
    assert 0.3 * np.std(x) < np.std(out) < 3 * np.std(x)


def test_chain_is_ordered():
    x = _voiceish(8000)
    ab = effects.apply_chain(
        x, SR, [{"type": "robot"}, {"type": "normalize", "target_lufs": -16}]
    )
    ba = effects.apply_chain(
        x, SR, [{"type": "normalize", "target_lufs": -16}, {"type": "robot"}]
    )
    assert not np.allclose(ab, ba)


def test_bucket_padding_is_invisible():
    """Same audio, two very different pad amounts -> same output."""
    x = _voiceish(5000)
    a = effects.apply_chain(x, SR, [{"type": "podcast_eq"}])
    b = effects.apply_chain(
        np.concatenate([x, np.zeros(4000, np.float32)]), SR, [{"type": "podcast_eq"}]
    )[:5000]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_module_is_scipy_free():
    import open_speech_tpu.audio.effects as mod
    import open_speech_tpu.ops.effects as ops_mod

    for m in (mod, ops_mod):
        assert not any(
            getattr(v, "__name__", "").startswith("scipy")
            for v in vars(m).values()
        ), f"{m.__name__} imports scipy"
