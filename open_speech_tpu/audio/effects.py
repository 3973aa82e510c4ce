"""Effects chain (reference: src/effects/chain.py) without librosa.

Same five effects and parameter surface: normalize (RMS to target level),
pitch (duration-preserving shift), reverb (exponential-decay FIR), podcast_eq
(80 Hz high-pass + 3 kHz presence peak), robot (100 Hz ring modulator). The
reference leans on librosa for pitch shift; here it's a self-contained phase
vocoder (numpy STFT) + polyphase resample, so the dependency set stays
jax/numpy/scipy.
"""

from __future__ import annotations

import numpy as np
from scipy import signal

SUPPORTED_EFFECTS = {"normalize", "pitch", "reverb", "podcast_eq", "robot"}


def apply_chain(
    samples: np.ndarray, sample_rate: int, effects: list[dict] | None
) -> np.ndarray:
    """Apply ordered list of effects. Each dict: {type: str, ...params}."""
    for fx in effects or []:
        fx_type = fx.get("type")
        if fx_type == "normalize":
            samples = _normalize(samples, fx.get("target_lufs", -16))
        elif fx_type == "pitch":
            samples = _pitch_shift(samples, sample_rate, fx.get("semitones", 0))
        elif fx_type == "reverb":
            room = fx.get("room", "small")
            mix_map = {"small": 0.25, "medium": 0.4, "large": 0.55}
            mix = fx.get("mix", mix_map.get(room, 0.3))
            samples = _reverb(samples, sample_rate, room, mix)
        elif fx_type == "podcast_eq":
            samples = _podcast_eq(samples, sample_rate)
        elif fx_type == "robot":
            samples = _robot(samples, sample_rate)
    return samples.astype(np.float32, copy=False)


def _normalize(samples: np.ndarray, target_lufs: float = -16) -> np.ndarray:
    rms = np.sqrt(np.mean(samples**2)) if len(samples) > 0 else 1.0
    if rms < 1e-8:
        return samples
    target_rms = 10 ** (target_lufs / 20)
    return samples * (target_rms / rms)


def _stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    x = np.pad(x, pad, mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.hanning(n_fft + 1)[:-1]
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]),
    )
    return np.fft.rfft(frames * window, axis=-1)


def _istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    window = np.hanning(n_fft + 1)[:-1]
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * window
    out = np.zeros((spec.shape[0] - 1) * hop + n_fft)
    norm = np.zeros_like(out)
    for i in range(spec.shape[0]):
        out[i * hop : i * hop + n_fft] += frames[i]
        norm[i * hop : i * hop + n_fft] += window**2
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad : pad + length]


def _time_stretch(x: np.ndarray, rate: float, n_fft: int = 2048, hop: int = 512):
    """Phase-vocoder time stretch by ``rate`` (librosa-equivalent algorithm)."""
    spec = _stft(x, n_fft, hop)
    n_frames = spec.shape[0]
    steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop, spec.shape[1])
    out = np.zeros((len(steps), spec.shape[1]), dtype=complex)
    phase_acc = np.angle(spec[0])
    for t, step in enumerate(steps):
        i = int(step)
        frac = step - i
        s0 = spec[min(i, n_frames - 1)]
        s1 = spec[min(i + 1, n_frames - 1)]
        mag = (1 - frac) * np.abs(s0) + frac * np.abs(s1)
        out[t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(s1) - np.angle(s0) - phi_advance
        dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase
    return _istft(out, n_fft, hop, int(round(len(x) / rate)))


def _pitch_shift(
    samples: np.ndarray, sample_rate: int, semitones: float = 0
) -> np.ndarray:
    """Duration-preserving pitch shift: stretch by 1/r then resample by r."""
    if semitones == 0:
        return samples
    rate = 2.0 ** (-semitones / 12.0)
    stretched = _time_stretch(samples.astype(np.float64), rate)
    # resample stretched -> original length (frequency scale by 1/rate)
    n = len(samples)
    src = np.linspace(0.0, len(stretched) - 1, n)
    return np.interp(src, np.arange(len(stretched)), stretched).astype(np.float32)


def _reverb(
    samples: np.ndarray, sample_rate: int, room: str = "small", mix: float = 0.2
) -> np.ndarray:
    room_ms = {"small": 50, "medium": 120, "large": 300}.get(room, 50)
    ir_len = max(1, int(sample_rate * room_ms / 1000))
    ir = np.exp(-np.linspace(0, 6, ir_len))
    ir /= ir.sum()
    wet = signal.fftconvolve(samples, ir, mode="full")[: len(samples)]
    return (1 - mix) * samples + mix * wet


def _podcast_eq(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    nyquist = sample_rate / 2
    b_hp, a_hp = signal.butter(2, 80 / nyquist, btype="high")
    samples = signal.lfilter(b_hp, a_hp, samples)
    b_pk, a_pk = signal.iirpeak(3000 / nyquist, Q=2)
    return signal.lfilter(b_pk, a_pk, samples)


def _robot(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    t = np.arange(len(samples)) / sample_rate
    carrier = np.sin(2 * np.pi * 100 * t)
    return samples * carrier
