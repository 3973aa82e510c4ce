"""JAX model implementations: whisper (STT), silero-style VAD, kokoro/piper (TTS)."""
