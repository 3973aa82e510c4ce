"""Open Speech TPU — a TPU-native speech server.

A from-scratch rebuild of the Open Speech server (reference:
will-assistant/open-speech) with every hot compute stage implemented in
JAX/XLA/Pallas on TPU: JAX Whisper with flash attention and KV-cached
incremental decoding, a fused STFT->log-mel front-end, JAX Silero-style VAD,
JAX Kokoro/Piper TTS, and a continuous-batching scheduler multiplexing
concurrent sessions onto the chip.

Package layout:
    ops/       audio + kernel substrate (codecs, resample, mel, attention, DSP)
    models/    JAX model implementations (whisper, vad, kokoro, piper)
    parallel/  device mesh / sharding layer
    runtime/   model manager, registry, lifecycle, continuous batcher
    server/    HTTP/WS API layer (aiohttp), streaming + realtime + wyoming
    studio/    SQLite-backed profiles/history/conversations/composer
    text/      formatters, pronunciation, SSML
    audio/     host-side ingest/encode (ffmpeg when present; pure WAV/PCM)
    cache/     TTS output cache
    client/    Python SDK
"""

__version__ = "0.1.0"
