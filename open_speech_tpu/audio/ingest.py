"""Audio ingest: anything -> 16 kHz mono WAV (reference: src/utils/audio.py).

WAV inputs are decoded natively (pure parser + device polyphase resample) —
no subprocess at all, unlike the reference which shells out to ffmpeg for
every request (src/utils/audio.py:10-38). Non-WAV compressed formats use
ffmpeg when the binary exists; otherwise the bytes pass through unchanged
(the reference's own fallback when conversion fails).
"""

from __future__ import annotations

import logging
import struct
import subprocess

import numpy as np

from open_speech_tpu.audio.encode import ffmpeg_available
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.ops.resample import resample_poly

logger = logging.getLogger(__name__)

TARGET_RATE = 16000

# content-type -> suffix map (reference: src/utils/audio.py:41-57)
CONTENT_TYPE_SUFFIX = {
    "audio/wav": ".wav",
    "audio/x-wav": ".wav",
    "audio/wave": ".wav",
    "audio/mpeg": ".mp3",
    "audio/mp3": ".mp3",
    "audio/mp4": ".m4a",
    "audio/x-m4a": ".m4a",
    "audio/aac": ".aac",
    "audio/ogg": ".ogg",
    "audio/opus": ".opus",
    "audio/flac": ".flac",
    "audio/x-flac": ".flac",
    "audio/webm": ".webm",
    "video/webm": ".webm",
}


def decode_to_float32(data: bytes) -> tuple[np.ndarray, int] | None:
    """Decode to (float32 mono, rate) natively if WAV, via ffmpeg otherwise."""
    if codec.is_wav(data):
        try:
            return codec.read_wav(data)
        except (ValueError, struct.error):
            # struct.error: header claims more bytes than the body carries
            # (truncated upload) — same passthrough as any other bad WAV
            return None
    if ffmpeg_available():
        try:
            proc = subprocess.run(
                [
                    "ffmpeg", "-i", "pipe:0", "-f", "f32le", "-ac", "1",
                    "-ar", str(TARGET_RATE), "pipe:1",
                ],
                input=data,
                capture_output=True,
                timeout=60,
                check=True,
            )
            audio = np.frombuffer(proc.stdout, dtype="<f4")
            return np.ascontiguousarray(audio), TARGET_RATE
        except Exception as e:  # noqa: BLE001
            logger.warning("ffmpeg decode failed: %s", e)
    return None


def convert_to_wav(data: bytes, content_type: str | None = None) -> bytes:
    """Any supported input -> 16 kHz mono 16-bit WAV; passthrough on failure."""
    decoded = decode_to_float32(data)
    if decoded is None:
        return data
    audio, rate = decoded
    if rate != TARGET_RATE:
        import jax.numpy as jnp

        audio = np.asarray(resample_poly(jnp.asarray(audio), TARGET_RATE, rate))
    return codec.write_wav(audio, TARGET_RATE)
