"""Config system: env parsing, prefixes, deprecation remap, aliases."""

import os

from open_speech_tpu import config as C


def test_defaults():
    s = C.Settings(env={})
    assert s.os_port == 8100
    assert s.os_host == "0.0.0.0"
    assert s.os_model_ttl == 300
    assert s.tts_voice == "af_heart"
    assert s.stt_vad_threshold == 0.5
    assert s.os_stream_chunk_ms == 100


def test_env_override_types():
    s = C.Settings(
        env={
            "OS_PORT": "9000",
            "OS_SSL_ENABLED": "false",
            "TTS_SPEED": "1.5",
            "OS_AUTH_REQUIRED": "1",
        }
    )
    assert s.os_port == 9000
    assert s.os_ssl_enabled is False
    assert s.tts_speed == 1.5
    assert s.os_auth_required is True


def test_case_insensitive():
    s = C.Settings(env={"os_port": "1234"})
    assert s.os_port == 1234


def test_alias_properties():
    s = C.Settings(env={"OS_PORT": "7777", "OS_MODEL_TTL": "60"})
    assert s.stt_port == 7777
    assert s.stt_model_ttl == 60
    assert s.stt_default_model == s.stt_model
    assert s.tts_default_voice == s.tts_voice


def test_deprecated_env_remap(monkeypatch):
    monkeypatch.delenv("OS_PORT", raising=False)
    monkeypatch.setenv("STT_PORT", "8222")
    warnings = C._check_deprecated_env_vars()
    assert os.environ["OS_PORT"] == "8222"
    assert warnings.get("STT_PORT") == "OS_PORT"
    monkeypatch.delenv("OS_PORT", raising=False)


def test_deprecated_does_not_override_new(monkeypatch):
    monkeypatch.setenv("STT_PORT", "1111")
    monkeypatch.setenv("OS_PORT", "2222")
    C._check_deprecated_env_vars()
    assert os.environ["OS_PORT"] == "2222"


def test_tts_effective_device():
    s = C.Settings(env={"STT_DEVICE": "tpu"})
    assert s.tts_effective_device == "tpu"
    s2 = C.Settings(env={"STT_DEVICE": "tpu", "TTS_DEVICE": "cpu"})
    assert s2.tts_effective_device == "cpu"


def test_round2_knobs_defaults():
    from open_speech_tpu.config import Settings

    s = Settings(env={})
    assert s.os_stream_incremental is True
    assert s.os_tts_batcher_enabled is False
    assert s.stt_rest_beam_size == 5


def test_round2_knobs_env_override():
    from open_speech_tpu.config import Settings

    s = Settings(env={
        "OS_STREAM_INCREMENTAL": "false",
        "OS_TTS_BATCHER_ENABLED": "1",
        "STT_REST_BEAM_SIZE": "3",
    })
    assert s.os_stream_incremental is False
    assert s.os_tts_batcher_enabled is True
    assert s.stt_rest_beam_size == 3


def test_invalid_boolean_rejected():
    import pytest

    from open_speech_tpu.config import Settings

    with pytest.raises(ValueError):
        Settings(env={"OS_STREAM_INCREMENTAL": "maybe"})
