"""TTS engines, all pure JAX: kokoro (ISTFTNet), piper (VITS),
pocket-tts (cloning). Each module exposes one backend class discovered by
the router's duck-typing scan.
"""

from open_speech_tpu.tts.backends.base import (
    TTSBackend,
    TTSLoadedModelInfo,
    VoiceInfo,
)

__all__ = ["TTSBackend", "TTSLoadedModelInfo", "VoiceInfo"]
