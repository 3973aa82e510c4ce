"""TTS serving layer: backend protocol, router, voices, synthesis pipeline."""
