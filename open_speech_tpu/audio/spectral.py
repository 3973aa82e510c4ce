"""Spectral-distance harness for TTS output comparison.

The reference has no quantitative TTS quality gate (SURVEY §6: acceptance
is manual listening); this gives the test suite and the parity harness a
number: log-mel spectral distance between two waveforms, the standard
mel-cepstral-flavored metric for "do these sound alike". Used to bound
the blockwise-vocoder approximation, converter regressions, and (with
real weights) released-checkpoint parity against recorded reference
audio.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.ops.mel import log_mel_spectrogram
from open_speech_tpu.ops.resample import resample_poly


def log_mel_distance(
    a: np.ndarray,
    b: np.ndarray,
    sample_rate: int,
    n_mels: int = 80,
) -> float:
    """Mean L2 distance between the log-mel spectrograms of two clips.

    Clips are aligned to the shorter length and resampled to 16 kHz (the
    mel front-end's native rate). 0.0 = identical; < ~0.1 is perceptually
    negligible for same-content audio; different utterances land > 1.
    """
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    n = min(len(a), len(b))
    if n == 0:
        return float("inf")
    a, b = a[:n], b[:n]
    if sample_rate != 16000:
        a = np.asarray(resample_poly(jnp.asarray(a), 16000, sample_rate))
        b = np.asarray(resample_poly(jnp.asarray(b), 16000, sample_rate))
    if len(a) < 400:  # below one STFT frame
        return float(np.sqrt(np.mean((a - b) ** 2)))
    ma = np.asarray(log_mel_spectrogram(jnp.asarray(a), n_mels=n_mels))
    mb = np.asarray(log_mel_spectrogram(jnp.asarray(b), n_mels=n_mels))
    return float(np.mean(np.linalg.norm(ma - mb, axis=0)) / np.sqrt(n_mels))


def spectral_report(a, b, sample_rate: int) -> dict:
    """Distance plus simple level diagnostics, for parity logs."""
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    return {
        "log_mel_distance": log_mel_distance(a, b, sample_rate),
        "rms_a": float(np.sqrt(np.mean(a**2))) if len(a) else 0.0,
        "rms_b": float(np.sqrt(np.mean(b**2))) if len(b) else 0.0,
        "len_ratio": (len(a) / len(b)) if len(b) else float("inf"),
    }
