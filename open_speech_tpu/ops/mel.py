"""Whisper log-mel front-end as fused XLA matmuls.

The reference delegates feature extraction to CTranslate2's C++ STFT
(src/backends/faster_whisper.py:245, inside WhisperModel.transcribe). Here the
whole front-end — framing, Hann window, real DFT, power, mel projection,
log/clamp/normalize — is a single jitted function built from three matmuls
(window-folded cos/sin DFT bases and the mel filterbank), which XLA tiles onto
the MXU and fuses with the elementwise tail. For n_fft=400 this beats an FFT
on TPU and keeps everything in one kernel launch.

Numerics match openai/whisper's ``log_mel_spectrogram``:
  - 16 kHz, n_fft=400, hop=160, periodic Hann, center/reflect padding,
    last frame dropped -> exactly len//hop frames.
  - Slaney-scale mel filterbank (librosa.filters.mel defaults), n_mels 80/128.
  - log10(clamp(p, 1e-10)); floor at max-8; (x+4)/4.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear <1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    lin = 3.0 * f / 200.0
    log_step = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, 15.0 + np.log(np.maximum(f, 1e-10) / min_log_hz) / log_step, lin
    )


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    log_step = np.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)), 200.0 * m / 3.0)


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, [n_mels, n_fft//2+1].

    Equivalent to librosa.filters.mel(sr, n_fft, n_mels) with defaults
    (fmin=0, fmax=sr/2, norm="slaney", htk=False) — the exact filters whisper
    ships in its ``mel_filters.npz``.
    """
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(
        hz_to_mel_slaney(np.array(0.0)), hz_to_mel_slaney(np.array(sr / 2.0)), n_mels + 2
    )
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@lru_cache(maxsize=4)
def _dft_bases_raw(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Plain real-DFT bases (no window): cos/sin [n_fft, n_fft//2+1].

    For callers that window frames themselves (e.g. kaldi fbank applies a
    povey window before the FFT — folding a Hann in here would silently
    double-window)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    return (
        np.cos(angle).astype(np.float32),
        (-np.sin(angle)).astype(np.float32),
    )


@lru_cache(maxsize=4)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT bases: cos/sin matrices [n_fft, n_fft//2+1]."""
    # periodic Hann (torch.hann_window default)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos_r, sin_r = _dft_bases_raw(n_fft)
    return (
        (cos_r * window[:, None].astype(np.float32)),
        (sin_r * window[:, None].astype(np.float32)),
    )


def _frame(audio: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-padded (reflect) framing, torch.stft semantics, last frame dropped.

    [..., n] -> [..., n//hop, n_fft]
    """
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = audio.shape[-1] // hop  # whisper drops the final frame
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_spectrogram(
    audio: jax.Array,
    n_mels: int = 128,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jax.Array:
    """float32 PCM [-1,1] [..., n] -> log-mel features [..., n_mels, n//hop].

    Matches openai-whisper's log_mel_spectrogram (the features CT2 computes
    natively in the reference backend, src/backends/faster_whisper.py:245).
    """
    # sub-hop clips would produce 0 frames (empty peak reduction) and
    # reflect-padding needs n > n_fft//2; zero-extend tiny inputs to one
    # full frame instead of crashing (static shapes: resolved at trace)
    min_n = max(hop, n_fft // 2 + 1)
    if audio.shape[-1] < min_n:
        audio = pad_or_trim(audio, min_n)
    frames = _frame(audio.astype(jnp.float32), n_fft, hop)
    cos_b, sin_b = _dft_bases(n_fft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im  # [..., T, n_bins]
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    mel = power @ fb.T  # [..., T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, T]


def pad_or_trim(audio: jax.Array, length: int = N_SAMPLES) -> jax.Array:
    """Pad with zeros / truncate the last axis to ``length`` (whisper's 30 s)."""
    n = audio.shape[-1]
    if n == length:
        return audio
    if n > length:
        return audio[..., :length]
    return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, length - n)])
