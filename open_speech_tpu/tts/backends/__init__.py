"""TTS backend implementations (JAX Kokoro, JAX Piper)."""
