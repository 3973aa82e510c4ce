"""Configuration from environment variables.

Reproduces the reference's settings surface (reference: src/config.py:89-275):
three env prefixes (``OS_`` server-level, ``STT_``, ``TTS_``), a
deprecated-name remap applied before instantiation (src/config.py:22-82), and
read-only back-compat alias properties (src/config.py:173-270) — implemented
here as a plain dataclass-style class with typed env parsing instead of
pydantic-settings (not available, and not needed: the schema is flat).

TPU additions live under the same convention: ``OS_TPU_*`` / ``STT_JAX_*``
knobs for mesh shape, compute dtype, and batcher sizing.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

# new_env_name -> old_env_name (reference: src/config.py:23-50)
_DEPRECATED_ENV_MAP: dict[str, str] = {
    # Server
    "OS_PORT": "STT_PORT",
    "OS_HOST": "STT_HOST",
    "OS_API_KEY": "STT_API_KEY",
    "OS_CORS_ORIGINS": "STT_CORS_ORIGINS",
    "OS_TRUST_PROXY": "STT_TRUST_PROXY",
    "OS_MAX_UPLOAD_MB": "STT_MAX_UPLOAD_MB",
    "OS_RATE_LIMIT": "STT_RATE_LIMIT",
    "OS_RATE_LIMIT_BURST": "STT_RATE_LIMIT_BURST",
    "OS_SSL_ENABLED": "STT_SSL_ENABLED",
    "OS_SSL_CERTFILE": "STT_SSL_CERTFILE",
    "OS_SSL_KEYFILE": "STT_SSL_KEYFILE",
    # Lifecycle
    "OS_MODEL_TTL": "STT_MODEL_TTL",
    "OS_MAX_LOADED_MODELS": "STT_MAX_LOADED_MODELS",
    # Streaming
    "OS_STREAM_CHUNK_MS": "STT_STREAM_CHUNK_MS",
    "OS_STREAM_VAD_THRESHOLD": "STT_STREAM_VAD_THRESHOLD",
    "OS_STREAM_ENDPOINTING_MS": "STT_STREAM_ENDPOINTING_MS",
    "OS_STREAM_MAX_CONNECTIONS": "STT_STREAM_MAX_CONNECTIONS",
    # STT renames
    "STT_MODEL": "STT_DEFAULT_MODEL",
    # TTS renames
    "TTS_MODEL": "TTS_DEFAULT_MODEL",
    "TTS_VOICE": "TTS_DEFAULT_VOICE",
    "TTS_SPEED": "TTS_DEFAULT_SPEED",
}

_TRUTHY = {"1", "true", "yes", "on", "t", "y"}
_FALSY = {"0", "false", "no", "off", "f", "n", ""}


def _check_deprecated_env_vars() -> dict[str, str]:
    """Copy old env names to new ones when only the old is set.

    Returns ``{old_name: new_name}`` for every deprecated name that is set,
    mirroring reference src/config.py:52-68.
    """
    warnings: dict[str, str] = {}
    for new_name, old_name in _DEPRECATED_ENV_MAP.items():
        old_val = os.environ.get(old_name)
        if old_val is not None:
            if os.environ.get(new_name) is None:
                os.environ[new_name] = old_val
            warnings[old_name] = new_name
    return warnings


def log_deprecation_warnings(warnings: dict[str, str]) -> None:
    for old_name, new_name in sorted(warnings.items()):
        logger.warning(
            "Deprecated env var '%s' — use '%s' instead. "
            "Old names will be removed in a future release.",
            old_name,
            new_name,
        )


def _parse(raw: str, default):
    """Parse an env string according to the default's type."""
    if isinstance(default, bool):
        low = raw.strip().lower()
        if low in _TRUTHY:
            return True
        if low in _FALSY:
            return False
        raise ValueError(f"invalid boolean: {raw!r}")
    if isinstance(default, int):
        return int(raw.strip())
    if isinstance(default, float):
        return float(raw.strip())
    return raw


# Field defaults. Names map 1:1 to uppercase env vars (reference:
# src/config.py:89-167). `None` defaults carry their type in _OPTIONAL_STR.
_DEFAULTS: dict[str, object] = {
    # ── Server (OS_ prefix) ────────────────────────────────────────────
    "os_port": 8100,
    "os_host": "0.0.0.0",
    "os_api_key": "",
    "os_auth_required": False,
    "os_cors_origins": "*",
    "os_ws_allowed_origins": "",
    "os_trust_proxy": False,
    "os_max_upload_mb": 100,
    "os_rate_limit": 0,
    "os_rate_limit_burst": 0,
    "os_ssl_enabled": True,
    "os_ssl_certfile": "",
    "os_ssl_keyfile": "",
    "os_voice_library_path": "/home/openspeech/data/voices",
    "os_voice_library_max_count": 100,
    "os_studio_db_path": "/home/openspeech/data/studio.db",
    "os_history_enabled": True,
    "os_history_max_entries": 1000,
    "os_history_retain_audio": True,
    "os_history_max_mb": 2000,
    "os_effects_enabled": True,
    "os_conversations_dir": "/home/openspeech/data/conversations",
    "os_composer_dir": "/home/openspeech/data/composer",
    "os_providers_dir": "/home/openspeech/data/providers",
    # ── Wyoming ────────────────────────────────────────────────────────
    "os_wyoming_enabled": False,
    "os_wyoming_host": "127.0.0.1",
    "os_wyoming_port": 10400,
    # ── Realtime API ───────────────────────────────────────────────────
    "os_realtime_enabled": True,
    "os_realtime_max_buffer_mb": 50,
    "os_realtime_idle_timeout_s": 120,
    # ── Model lifecycle ────────────────────────────────────────────────
    "os_model_ttl": 300,
    "os_max_loaded_models": 0,
    # ── Streaming ──────────────────────────────────────────────────────
    "os_stream_chunk_ms": 100,
    "os_stream_vad_threshold": 0.5,
    "os_stream_endpointing_ms": 300,
    "os_stream_max_connections": 10,
    # ── VAD ────────────────────────────────────────────────────────────
    "stt_vad_enabled": True,
    "stt_vad_threshold": 0.5,
    "stt_vad_min_speech_ms": 250,
    "stt_vad_silence_ms": 800,
    # ── STT ────────────────────────────────────────────────────────────
    "stt_model": "whisper-large-v3-turbo",
    # Quality routing: REST transcription decodes with this beam width
    # (reference default beam_size=5, src/backends/faster_whisper.py:235-245);
    # streaming sessions always decode greedily for latency.
    "stt_rest_beam_size": 5,
    "stt_device": "tpu",
    "stt_compute_type": "bfloat16",
    "stt_model_dir": None,
    "stt_preload_models": "",
    # ── TTS ────────────────────────────────────────────────────────────
    "tts_enabled": True,
    "tts_model": "kokoro",
    "tts_voice": "af_heart",
    "tts_device": None,
    "tts_max_input_length": 4096,
    "tts_default_format": "mp3",
    "tts_speed": 1.0,
    "tts_preload_models": "",
    "tts_voices_config": "",
    "tts_cache_enabled": False,
    "tts_cache_max_mb": 500,
    "tts_cache_dir": "/var/lib/open-speech/cache",
    "tts_trim_silence": True,
    "tts_normalize_output": True,
    "tts_pronunciation_dict": "",
    # ── Diarization / audio processing ─────────────────────────────────
    "stt_diarize_enabled": False,
    "stt_noise_reduce": False,
    "stt_normalize": True,
    # ── TPU-native additions (no reference counterpart) ────────────────
    # Mesh shape as "data,model" axis sizes; 0 = auto (all devices on data).
    "os_tpu_mesh": "",
    # Incremental streaming: O(n) block-causal encoder for interim results
    # (each mel frame encoded once) instead of the reference's per-chunk
    # full re-transcription; finals still run the exact full-window pass.
    "os_stream_incremental": True,
    # Continuous batcher: route streaming/realtime transcription through the
    # shared slot-pool scheduler instead of per-request invocations.
    "os_batcher_enabled": False,
    # TTS request batching: concurrent kokoro/piper synthesis jobs share
    # one batched encode + blockwise-vocode device program, and pocket-tts
    # sessions share a fused slot-pool LM step (runtime/pocket_batcher).
    "os_tts_batcher_enabled": False,
    # Pocket-TTS slot-pool size: concurrent sessions advanced per fused
    # LM step. Static per process (sizes the compiled pool programs and
    # the device KV pool: ~2*L*H*max_ctx*Dh*slots cache entries).
    "os_pocket_batch_slots": 16,
    # Frames per pool group (one host sync advances every live session
    # this many 80 ms frames and decodes one Mimi block).
    "os_pocket_block_frames": 2,
    # Max concurrent sessions per continuous-batch decode step.
    "os_batch_max_sessions": 8,
    # Decode positions generated per host sync (fused on-device sub-steps).
    "os_batch_steps_per_tick": 4,
    # Decode-side KV cache length bucket (tokens).
    "os_batch_max_tokens": 448,
    # jit warmup on model load (precompile hot shapes).
    "os_precompile_on_load": True,
    # Speculative decoding: model id of a small draft model (e.g.
    # "whisper-tiny") that proposes tokens the main model verifies in one
    # batched pass; output tokens identical to plain greedy. Applies to
    # single-request temperature-0 greedy decodes (REST beam-5 and batched
    # streaming paths are unaffected). Empty = off.
    "os_spec_draft_model": "",
    # Draft tokens proposed per verify pass.
    "os_spec_gamma": 4,
    # TTS batch buckets compiled at load ("1,4,16,64"); any bucket left out
    # compiles on the first request burst that reaches it (~90 s for the
    # 64-wide kokoro program on a cold cache).
    "os_tts_precompile_buckets": "1,4,16,64",
    # STT serving shapes compiled at load: decode budgets (tokens) for the
    # greedy and beam-5 programs. "224" = the full-window budget every 30 s
    # segment of a long file hits; add smaller buckets for short clips.
    "os_stt_precompile_budgets": "224",
    # Batched long-form transcription: files longer than two 30 s windows
    # decode as a batch of independent chunks cut at quiet points (the
    # faster-whisper BatchedInferencePipeline trade: ~Nx faster on long
    # files, no cross-window text conditioning). Off = the reference's
    # sequential conditioned seek loop.
    "os_stt_batched_longform": False,
    # Max windows per batched long-form device step.
    "os_stt_batch_windows": 16,
    # Previous-text conditioning buckets warmed at load (prompt-shape
    # ladder of transcribe._bucket_prev). The full-room bucket is always
    # warmed; trim this list to shorten model-load warmup.
    "os_stt_precompile_prev_buckets": "4,8,16,32,64,128",
    # jax.profiler trace output dir for /api/profiler/start|stop
    "os_profile_dir": "/tmp/open-speech-profile",
}

_OPTIONAL_STR = {"stt_model_dir", "tts_device"}


class Settings:
    """Flat settings object; every field also readable via alias properties."""

    def __init__(self, env: dict[str, str] | None = None) -> None:
        env = dict(os.environ if env is None else env)
        # case-insensitive env lookup (pydantic-settings semantics)
        upper = {k.upper(): v for k, v in env.items()}
        for name, default in _DEFAULTS.items():
            raw = upper.get(name.upper())
            if raw is None:
                value = default
            elif name in _OPTIONAL_STR:
                value = raw
            else:
                value = _parse(raw, default)
            setattr(self, name, value)

    # ── Derived ────────────────────────────────────────────────────────
    @property
    def tts_effective_device(self) -> str:
        return self.tts_device or self.stt_device

    # ── Back-compat aliases (reference: src/config.py:173-270) ────────
    stt_port = property(lambda self: self.os_port)
    stt_host = property(lambda self: self.os_host)
    stt_api_key = property(lambda self: self.os_api_key)
    stt_cors_origins = property(lambda self: self.os_cors_origins)
    stt_trust_proxy = property(lambda self: self.os_trust_proxy)
    stt_ws_allowed_origins = property(lambda self: self.os_ws_allowed_origins)
    voice_library_path = property(lambda self: self.os_voice_library_path)
    voice_library_max_count = property(
        lambda self: self.os_voice_library_max_count
    )
    stt_max_upload_mb = property(lambda self: self.os_max_upload_mb)
    stt_rate_limit = property(lambda self: self.os_rate_limit)
    stt_rate_limit_burst = property(lambda self: self.os_rate_limit_burst)
    stt_ssl_enabled = property(lambda self: self.os_ssl_enabled)
    stt_ssl_certfile = property(lambda self: self.os_ssl_certfile)
    stt_ssl_keyfile = property(lambda self: self.os_ssl_keyfile)
    stt_model_ttl = property(lambda self: self.os_model_ttl)
    stt_max_loaded_models = property(lambda self: self.os_max_loaded_models)
    stt_stream_chunk_ms = property(lambda self: self.os_stream_chunk_ms)
    stt_stream_vad_threshold = property(
        lambda self: self.os_stream_vad_threshold
    )
    stt_stream_endpointing_ms = property(
        lambda self: self.os_stream_endpointing_ms
    )
    stt_stream_max_connections = property(
        lambda self: self.os_stream_max_connections
    )
    stt_default_model = property(lambda self: self.stt_model)
    tts_default_model = property(lambda self: self.tts_model)
    tts_default_voice = property(lambda self: self.tts_voice)
    tts_default_speed = property(lambda self: self.tts_speed)


_deprecation_warnings = _check_deprecated_env_vars()

settings = Settings()

if _deprecation_warnings:
    log_deprecation_warnings(_deprecation_warnings)


def reload_settings(env: dict[str, str] | None = None) -> Settings:
    """Re-read settings (tests); mutates the module-level singleton in place."""
    fresh = Settings(env)
    settings.__dict__.update(fresh.__dict__)
    return settings
