"""Realtime input buffer + format codecs (reference: src/realtime/audio_buffer.py).

g711 u-law/a-law use the framework's LUT companding (ops.audio) instead of
the stdlib audioop module the reference depends on (removed in Python 3.13,
SURVEY §2.8). pcm16 in the OpenAI Realtime API is 24 kHz mono LE; internal
processing is 16 kHz.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from open_speech_tpu.models.vad.silero import VAD_SAMPLE_RATE, SileroVAD
from open_speech_tpu.ops import audio as codec

logger = logging.getLogger(__name__)


def _resample_linear(pcm_bytes: bytes, from_rate: int, to_rate: int) -> bytes:
    return codec.linear_resample_pcm16(pcm_bytes, from_rate, to_rate)


def decode_audio_to_pcm16(data: bytes, fmt: str, target_rate: int = 16000) -> bytes:
    """Decode realtime-format audio to PCM16 mono at target_rate."""
    if fmt == "pcm16":
        return _resample_linear(data, 24000, target_rate)
    if fmt == "g711_ulaw":
        pcm = codec.ulaw_decode(data).tobytes()
        return _resample_linear(pcm, 8000, target_rate)
    if fmt == "g711_alaw":
        pcm = codec.alaw_decode(data).tobytes()
        return _resample_linear(pcm, 8000, target_rate)
    raise ValueError(f"Unsupported audio format: {fmt}")


def encode_pcm16_to_format(pcm16_data: bytes, from_rate: int, fmt: str) -> bytes:
    """Encode PCM16 mono audio to a realtime output format."""
    if fmt == "pcm16":
        return _resample_linear(pcm16_data, from_rate, 24000)
    if fmt == "g711_ulaw":
        pcm_8k = _resample_linear(pcm16_data, from_rate, 8000)
        return codec.ulaw_encode(np.frombuffer(pcm_8k, dtype="<i2")).tobytes()
    if fmt == "g711_alaw":
        pcm_8k = _resample_linear(pcm16_data, from_rate, 8000)
        return codec.alaw_encode(np.frombuffer(pcm_8k, dtype="<i2")).tobytes()
    raise ValueError(f"Unsupported audio format: {fmt}")


class InputAudioBuffer:
    """Bounded input buffer with VAD hysteresis (internal PCM16 @16 kHz)."""

    def __init__(
        self,
        vad: SileroVAD | None = None,
        threshold: float = 0.5,
        silence_duration_ms: int = 500,
        max_buffer_bytes: int = 50 * 1024 * 1024,
    ):
        self._buffer = bytearray()
        self._vad = vad
        self._threshold = threshold
        self._silence_duration_ms = silence_duration_ms
        self._in_speech = False
        self._silence_samples = 0
        self._speech_start_ms = 0
        self._total_samples = 0
        self._max_buffer_bytes = max_buffer_bytes

    @property
    def in_speech(self) -> bool:
        return self._in_speech

    def clear(self) -> None:
        self._buffer.clear()
        self._silence_samples = 0

    def append(self, pcm16_16khz: bytes) -> list[dict[str, Any]]:
        events: list[dict[str, Any]] = []
        frame_size = len(pcm16_16khz)
        if frame_size > self._max_buffer_bytes:
            self.clear()
            raise BufferError(
                f"Audio frame exceeds max buffer size ({self._max_buffer_bytes} bytes)"
            )
        if len(self._buffer) + frame_size > self._max_buffer_bytes:
            raise BufferError(
                f"Input audio buffer exceeded max size ({self._max_buffer_bytes} bytes)"
            )
        self._buffer.extend(pcm16_16khz)

        num_samples = frame_size // 2
        current_ms = (self._total_samples * 1000) // VAD_SAMPLE_RATE
        self._total_samples += num_samples

        if self._vad is None:
            return events

        audio = (
            np.frombuffer(pcm16_16khz, dtype=np.int16).astype(np.float32) / 32768.0
        )
        if len(audio) == 0:
            return events

        prob = self._vad(audio)
        if prob >= self._threshold:
            self._silence_samples = 0
            if not self._in_speech:
                self._in_speech = True
                self._speech_start_ms = current_ms
                events.append(
                    {"type": "speech_started", "audio_start_ms": current_ms}
                )
        elif self._in_speech:
            self._silence_samples += num_samples
            silence_ms = (self._silence_samples * 1000) // VAD_SAMPLE_RATE
            if silence_ms >= self._silence_duration_ms:
                self._in_speech = False
                self._silence_samples = 0
                events.append(
                    {"type": "speech_stopped", "audio_end_ms": current_ms}
                )
        return events

    def commit(self) -> bytes:
        data = bytes(self._buffer)
        self.clear()
        return data

    def get_audio(self) -> bytes:
        return bytes(self._buffer)
