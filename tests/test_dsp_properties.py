"""DSP property tests: resampler fidelity, ingest matrix, mel invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_speech_tpu.audio.ingest import CONTENT_TYPE_SUFFIX, convert_to_wav
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.ops.mel import log_mel_spectrogram
from open_speech_tpu.ops.resample import resample_pcm16, resample_poly


def _tone(freq, rate, seconds=0.5, amp=0.4):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("src,dst", [(48000, 16000), (44100, 16000),
                                     (8000, 16000), (24000, 16000)])
def test_resample_preserves_tone_frequency(src, dst):
    """A 440 Hz tone must stay 440 Hz through any rate conversion."""
    x = _tone(440, src)
    y = np.asarray(resample_poly(jnp.asarray(x), dst, src))
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freq = np.fft.rfftfreq(len(y), 1 / dst)[np.argmax(spec)]
    assert freq == pytest.approx(440, abs=dst / len(y) * 2)


def test_resample_attenuates_above_nyquist():
    """Downsampling must suppress content above the target Nyquist."""
    x = _tone(7000, 48000) + _tone(300, 48000)
    y = np.asarray(resample_poly(jnp.asarray(x), 8000, 48000))
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / 8000)
    low = spec[(freqs > 250) & (freqs < 350)].max()
    # 7 kHz is above the 4 kHz output Nyquist: must be strongly attenuated
    alias = spec[freqs > 3500].max()
    assert low > 20 * alias


def test_resample_pcm16_identity():
    pcm = (np.arange(-100, 100, dtype=np.int16)).tobytes()
    assert resample_pcm16(pcm, 16000, 16000) == pcm


@pytest.mark.parametrize(
    "ctype,suffix",
    [("audio/mpeg", ".mp3"), ("audio/wav", ".wav"), ("audio/ogg", ".ogg"),
     ("audio/flac", ".flac"), ("audio/webm", ".webm")],
)
def test_content_type_suffix_map(ctype, suffix):
    assert CONTENT_TYPE_SUFFIX[ctype] == suffix


def test_convert_to_wav_resamples_to_16k():
    wav48 = codec.write_wav(_tone(440, 48000), 48000)
    out = convert_to_wav(wav48, "audio/wav")
    pcm, rate = codec.read_wav(out)
    assert rate == 16000
    assert len(pcm) == pytest.approx(0.5 * 16000, rel=0.02)


def test_convert_to_wav_stereo_downmix():
    t = np.arange(8000) / 16000
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    import struct

    inter = np.empty(2 * len(t), np.float32)
    inter[0::2] = left
    inter[1::2] = 0.0
    pcm = (np.clip(inter, -1, 1) * 32767).astype(np.int16).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, 2, 16000, 16000 * 4, 4, 16, b"data", len(pcm),
    )
    out = convert_to_wav(hdr + pcm, "audio/wav")
    mono, rate = codec.read_wav(out)
    assert rate == 16000
    # downmix halves the left-only amplitude
    assert np.abs(mono).max() == pytest.approx(0.25, abs=0.02)


def test_log_mel_energy_ordering():
    quiet = np.asarray(
        log_mel_spectrogram(jnp.asarray(_tone(440, 16000, amp=0.01)))
    )
    loud = np.asarray(
        log_mel_spectrogram(jnp.asarray(_tone(440, 16000, amp=0.5)))
    )
    assert loud.max() > quiet.max()


def test_log_mel_tone_hits_expected_band():
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(_tone(3000, 16000))))
    hot = int(np.argmax(mel.mean(axis=1)))
    lo = np.asarray(log_mel_spectrogram(jnp.asarray(_tone(200, 16000))))
    cold = int(np.argmax(lo.mean(axis=1)))
    assert hot > cold  # higher frequency lands in a higher mel band
