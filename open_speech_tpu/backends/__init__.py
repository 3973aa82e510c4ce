"""STT backends (JAX Whisper is the default and only compute backend)."""
