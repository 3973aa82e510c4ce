"""TTS spectral-distance harness + realtime g711/format matrix.

Two round-1 VERDICT item-7 holes: a quantitative spectral gate for TTS
outputs, and a format matrix over the realtime audio path (g711 u/a-law,
pcm16 at 24 kHz) — the reference leaned on the removed-in-3.13 audioop
module here (SURVEY §2.8)."""

import numpy as np
import pytest

from open_speech_tpu.audio.spectral import log_mel_distance, spectral_report
from open_speech_tpu.server.realtime.audio_buffer import (
    decode_audio_to_pcm16,
    encode_pcm16_to_format,
)


def _tone(freq, seconds=0.5, rate=24000, amp=0.4):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ── spectral harness ──────────────────────────────────────────────────


def test_identical_clips_zero_distance():
    a = _tone(440)
    assert log_mel_distance(a, a, 24000) == pytest.approx(0.0, abs=1e-6)


def test_small_noise_small_distance():
    a = _tone(440)
    b = a + np.random.default_rng(0).normal(0, 1e-3, a.shape).astype(np.float32)
    d = log_mel_distance(a, b, 24000)
    assert 0 < d < 0.3  # -60 dB noise lifts only the silent-bin floor


def test_different_content_large_distance():
    d = log_mel_distance(_tone(220), _tone(1760), 24000)
    assert d > 0.5


def test_distance_orders_similarity():
    base = _tone(440)
    near = _tone(450)
    far = _tone(1760)
    assert log_mel_distance(base, near, 24000) < log_mel_distance(
        base, far, 24000
    )


def test_blockwise_vocoder_spectrally_close():
    """The block-local AdaIN approximation must be spectrally negligible
    relative to a content change."""
    import jax

    from open_speech_tpu.models.kokoro import init_kokoro_params, vocode
    from open_speech_tpu.models.kokoro.model import TINY_CONFIG, vocode_blocks
    from tests.test_tts import _kokoro_encode

    cfg = TINY_CONFIG
    params = init_kokoro_params(jax.random.PRNGKey(7), cfg)
    g, n_frames = _kokoro_encode("spectral distance gate", cfg, params)
    total = int(n_frames[0])
    rng = jax.random.PRNGKey(3)
    full = np.asarray(vocode(params, cfg, g, n_frames, rng))[
        0, : total * cfg.samples_per_frame
    ]
    blocked = np.concatenate(
        [b[0] for b in vocode_blocks(params, cfg, g, n_frames, rng=rng,
                                     block_frames=24)]
    )
    rep = spectral_report(blocked, full, cfg.sample_rate)
    assert rep["log_mel_distance"] < 0.25
    assert rep["len_ratio"] == pytest.approx(1.0)


# ── realtime format matrix ────────────────────────────────────────────


@pytest.mark.parametrize("fmt", ["pcm16", "g711_ulaw", "g711_alaw"])
def test_realtime_format_roundtrip_spectral(fmt):
    """decode(encode(x)) must be spectrally transparent for every realtime
    input_audio_format (G.711 is 8-bit companded: lossy but close)."""
    tone = _tone(440, rate=16000)
    pcm16 = (np.clip(tone, -1, 1) * 32767).astype(np.int16).tobytes()
    wire = encode_pcm16_to_format(pcm16, 16000, fmt)
    back = decode_audio_to_pcm16(wire, fmt, target_rate=16000)
    a = np.frombuffer(pcm16, np.int16).astype(np.float32) / 32768
    b = np.frombuffer(back, np.int16).astype(np.float32) / 32768
    n = min(len(a), len(b))
    assert abs(len(a) - len(b)) <= 400  # resample edge tolerance
    d = log_mel_distance(a[:n], b[:n], 16000)
    # 8-bit companding lifts the quiet-bin floor; content bins survive
    assert d < (0.15 if fmt == "pcm16" else 0.5), (fmt, d)


def test_realtime_pcm16_24k_roundtrip():
    """pcm16 wire format is 24 kHz in the realtime API; internal is 16 k."""
    tone = _tone(440, rate=24000)
    wire = (np.clip(tone, -1, 1) * 32767).astype(np.int16).tobytes()
    internal = decode_audio_to_pcm16(wire, "pcm16", target_rate=16000)
    assert len(internal) == pytest.approx(len(wire) * 16 / 24, rel=0.01)
    out = encode_pcm16_to_format(internal, 16000, "pcm16")
    assert len(out) == pytest.approx(len(wire), rel=0.01)
    a = np.frombuffer(wire, np.int16).astype(np.float32) / 32768
    b = np.frombuffer(out, np.int16).astype(np.float32) / 32768
    n = min(len(a), len(b))
    assert log_mel_distance(a[:n], b[:n], 24000) < 0.2


@pytest.mark.parametrize("fmt", ["g711_ulaw", "g711_alaw"])
def test_g711_loud_and_quiet_preserved(fmt):
    """Companding must keep both loud and quiet signal levels ordered."""
    loud = _tone(300, rate=16000, amp=0.8)
    quiet = _tone(300, rate=16000, amp=0.05)

    def thru(x):
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes()
        back = decode_audio_to_pcm16(
            encode_pcm16_to_format(pcm, 16000, fmt), fmt, 16000
        )
        return np.frombuffer(back, np.int16).astype(np.float32) / 32768

    rms = lambda x: np.sqrt(np.mean(x**2))  # noqa: E731
    assert rms(thru(loud)) == pytest.approx(rms(loud), rel=0.1)
    assert rms(thru(quiet)) == pytest.approx(rms(quiet), rel=0.15)
