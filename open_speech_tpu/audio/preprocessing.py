"""STT input preprocessing (reference: src/audio/preprocessing.py).

Same contract: WAV bytes in, WAV bytes out; non-WAV input passes through
untouched (:53-58); RMS gain normalization to -18 dBFS (:35-43); noise
reduction is optional and gated on its dependency (:45-50).
"""

from __future__ import annotations

import numpy as np

from open_speech_tpu.ops import audio as codec


def wav_bytes_to_float32_mono(wav_bytes: bytes) -> tuple[np.ndarray, int]:
    audio, sr = codec.read_wav(wav_bytes)
    return audio, sr


def float32_mono_to_wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    return codec.write_wav(audio, sample_rate)


def normalize_gain(audio: np.ndarray, target_dbfs: float = -18.0) -> np.ndarray:
    rms = float(np.sqrt(np.mean(np.square(audio)))) if len(audio) else 0.0
    if rms <= 1e-8:
        return audio
    gain = 10 ** ((target_dbfs - 20 * np.log10(rms)) / 20)
    return np.clip(audio * gain, -1.0, 1.0)


def reduce_noise(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    try:
        import noisereduce as nr  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "Noise reduction requires optional dependency: "
            "pip install 'open-speech[noise]'"
        ) from e
    return nr.reduce_noise(y=audio, sr=sample_rate)


def preprocess_stt_audio(
    wav_bytes: bytes, *, noise_reduce: bool, normalize: bool
) -> bytes:
    try:
        audio, sr = wav_bytes_to_float32_mono(wav_bytes)
    except Exception:
        # non-WAV bytes pass through (reference behavior for odd inputs)
        return wav_bytes
    if noise_reduce:
        audio = reduce_noise(audio, sr)
    if normalize:
        audio = normalize_gain(audio)
    return float32_mono_to_wav_bytes(audio, sr)
