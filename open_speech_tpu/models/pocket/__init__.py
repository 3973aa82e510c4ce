"""JAX pocket-TTS: style-cloning TTS (reference-audio / voice-design conditioning)."""

from open_speech_tpu.models.pocket.model import (
    PocketConfig,
    init_pocket_params,
    style_from_audio,
    style_from_text,
    synthesize_pocket,
)

__all__ = [
    "PocketConfig",
    "init_pocket_params",
    "style_from_audio",
    "style_from_text",
    "synthesize_pocket",
]
