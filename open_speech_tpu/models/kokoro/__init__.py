"""JAX Kokoro TTS: style-conditioned phoneme encoder + ISTFTNet vocoder."""

from open_speech_tpu.models.kokoro.model import (
    KokoroConfig,
    encode_utterance,
    init_kokoro_params,
    synthesize_frames,
    vocode,
    vocode_blocks,
    voice_vector,
)

__all__ = [
    "KokoroConfig",
    "encode_utterance",
    "init_kokoro_params",
    "synthesize_frames",
    "vocode",
    "vocode_blocks",
    "voice_vector",
]
