"""Golden tests: JAX resampler vs scipy, mel front-end vs numpy STFT."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_speech_tpu.ops import mel as M
from open_speech_tpu.ops.resample import resample_poly, resample_pcm16

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.mark.parametrize("up,down", [(1, 2), (2, 1), (160, 441), (441, 160), (3, 2)])
def test_resample_poly_matches_scipy(up, down):
    rng = np.random.default_rng(42)
    x = rng.standard_normal(4000).astype(np.float32)
    ours = np.asarray(resample_poly(jnp.asarray(x), up, down))
    ref = scipy_signal.resample_poly(x, up, down).astype(np.float32)
    assert ours.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ours - ref)) / scale < 5e-4


def test_resample_preserves_dc():
    x = np.ones(1600, dtype=np.float32) * 0.5
    y = np.asarray(resample_poly(jnp.asarray(x), 1, 2))
    assert y.shape == (800,)
    assert np.allclose(y[50:-50], 0.5, atol=1e-3)


def test_resample_pcm16_bytes():
    t = np.arange(16000) / 16000
    tone = (np.sin(2 * np.pi * 440 * t) * 10000).astype("<i2").tobytes()
    out = resample_pcm16(tone, 16000, 8000)
    assert len(out) == 16000  # 8000 samples * 2 bytes
    ref = scipy_signal.resample_poly(
        np.frombuffer(tone, dtype="<i2").astype(np.float32), 1, 2
    )
    got = np.frombuffer(out, dtype="<i2").astype(np.float32)
    assert np.max(np.abs(got - ref)) < 40  # int rounding + float tol


def _numpy_log_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """Straight-line numpy re-statement of whisper's log_mel_spectrogram."""
    n_fft, hop = 400, 160
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    x = np.pad(audio, n_fft // 2, mode="reflect")
    n_frames = len(audio) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window, axis=-1)
    power = np.abs(spec) ** 2
    fb = M.mel_filterbank(n_mels)
    melspec = power @ fb.T
    log_spec = np.log10(np.maximum(melspec, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T.astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_numpy_fft(n_mels):
    rng = np.random.default_rng(7)
    audio = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    ours = np.asarray(M.log_mel_spectrogram(jnp.asarray(audio), n_mels=n_mels))
    ref = _numpy_log_mel(audio, n_mels)
    assert ours.shape == ref.shape == (n_mels, 100)
    assert np.max(np.abs(ours - ref)) < 2e-4


def test_log_mel_30s_shape():
    audio = jnp.zeros(M.N_SAMPLES)
    feats = M.log_mel_spectrogram(audio, n_mels=128)
    assert feats.shape == (128, 3000)


def test_mel_filterbank_properties():
    fb = M.mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert np.all(fb >= 0)
    # peaks strictly increase in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    # slaney normalization: area under each filter ~ 2/bandwidth
    assert fb.sum() > 0


def test_pad_or_trim():
    x = jnp.ones(100)
    assert M.pad_or_trim(x, 200).shape == (200,)
    assert M.pad_or_trim(x, 50).shape == (50,)
    assert float(M.pad_or_trim(x, 200)[150]) == 0.0
