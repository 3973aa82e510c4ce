"""JAX Kokoro TTS: style-conditioned phoneme encoder + ISTFTNet vocoder."""

from open_speech_tpu.models.kokoro.model import (
    KokoroConfig,
    init_kokoro_params,
    synthesize_frames,
    voice_vector,
)

__all__ = [
    "KokoroConfig",
    "init_kokoro_params",
    "synthesize_frames",
    "voice_vector",
]
