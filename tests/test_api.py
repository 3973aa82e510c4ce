"""API tests via aiohttp TestClient with mocked routers.

Mirrors the reference pattern (tests/test_api.py:15-27 patches
``router._default_backend`` with a MagicMock) against the full app.
"""

import asyncio
import io
import json
from unittest.mock import MagicMock

import numpy as np
import pytest

from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from open_speech_tpu.ops import audio as codec


def client_test(coro_fn):
    """Run an async test body against a fresh app + client."""
    from open_speech_tpu.server.app import create_app

    async def runner():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)

    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        runner()
    )


@pytest.fixture
def mock_stt():
    """Patch the STT router's backend with a MagicMock."""
    from open_speech_tpu.runtime.router import router

    original = router._default_backend
    mock = MagicMock()
    mock.name = "jax-whisper"
    mock.transcribe.return_value = {"text": "hello world"}
    mock.translate.return_value = {"text": "hello world"}
    mock.loaded_models.return_value = []
    mock.list_cached_models.return_value = []
    mock.is_model_loaded.return_value = True
    router._default_backend = mock
    for key in list(router._backends):
        router._backends[key] = mock
    yield mock
    router._default_backend = original
    for key in list(router._backends):
        router._backends[key] = original


def _wav_bytes(duration_s=0.5) -> bytes:
    t = np.arange(int(16000 * duration_s)) / 16000
    return codec.write_wav(
        (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000
    )


# ── health + models ───────────────────────────────────────────────────


def test_health(mock_stt):
    async def body(client):
        resp = await client.get("/health")
        assert resp.status == 200
        data = await resp.json()
        assert data["status"] == "ok"
        assert "version" in data

    client_test(body)


def test_list_models(mock_stt):
    async def body(client):
        resp = await client.get("/v1/models")
        data = await resp.json()
        assert data["object"] == "list"
        assert len(data["data"]) >= 1

    client_test(body)


def test_get_model(mock_stt):
    async def body(client):
        resp = await client.get("/v1/models/whisper-tiny")
        data = await resp.json()
        assert data["id"] == "whisper-tiny"
        assert data["object"] == "model"

    client_test(body)


# ── transcriptions ────────────────────────────────────────────────────


def test_transcribe_json(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="test.wav",
                       content_type="audio/wav")
        form.add_field("model", "whisper-tiny")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 200
        data = await resp.json()
        assert data["text"] == "hello world"
        # backend called with verbose_json (reference behavior)
        _, kwargs = mock_stt.transcribe.call_args
        assert kwargs["response_format"] == "verbose_json"

    client_test(body)


def test_transcribe_empty_file(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("file", b"", filename="empty.wav",
                       content_type="audio/wav")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 400
        data = await resp.json()
        assert "error" in data
        assert "Empty audio file" in data["error"]["message"]

    client_test(body)


def test_transcribe_missing_file(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("model", "whisper-tiny")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 422

    client_test(body)


def test_transcribe_text_format(mock_stt):
    mock_stt.transcribe.return_value = {"text": "plain text out"}

    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="t.wav",
                       content_type="audio/wav")
        form.add_field("response_format", "text")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 200
        assert "text/plain" in resp.headers["Content-Type"]
        assert (await resp.text()) == "plain text out"

    client_test(body)


def test_transcribe_srt_format(mock_stt):
    mock_stt.transcribe.return_value = {
        "text": "hi",
        "segments": [{"start": 0.0, "end": 1.0, "text": "hi"}],
    }

    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="t.wav",
                       content_type="audio/wav")
        form.add_field("response_format", "srt")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        text = await resp.text()
        assert text.startswith("1\n00:00:00,000 --> 00:00:01,000")

    client_test(body)


def test_transcribe_diarize_disabled(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="t.wav",
                       content_type="audio/wav")
        resp = await client.post(
            "/v1/audio/transcriptions?diarize=true", data=form
        )
        assert resp.status == 400
        assert "Diarization is disabled" in (await resp.json())["error"]["message"]

    client_test(body)


def test_translate(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="t.wav",
                       content_type="audio/wav")
        resp = await client.post("/v1/audio/translations", data=form)
        assert resp.status == 200
        assert (await resp.json())["text"] == "hello world"
        assert mock_stt.translate.called

    client_test(body)


# ── management ────────────────────────────────────────────────────────


def test_api_ps_empty(mock_stt):
    async def body(client):
        resp = await client.get("/api/ps")
        assert resp.status == 200
        assert (await resp.json())["models"] == []

    client_test(body)


def test_api_models_list(mock_stt):
    async def body(client):
        resp = await client.get("/api/models")
        data = await resp.json()
        ids = {m["id"] for m in data["models"]}
        assert "whisper-large-v3-turbo" in ids
        assert "kokoro" in ids
        tts = [m for m in data["models"] if m["type"] == "tts"]
        assert all("capabilities" in m for m in tts)

    client_test(body)


def test_model_status_and_progress(mock_stt):
    async def body(client):
        resp = await client.get("/api/models/whisper-tiny/status")
        data = await resp.json()
        assert data["id"] == "whisper-tiny"
        assert data["state"] in ("provider_installed", "downloaded")
        resp = await client.get("/api/models/whisper-tiny/progress")
        prog = await resp.json()
        assert prog["status"] in ("idle", "ready")

    client_test(body)


def test_unload_not_loaded(mock_stt):
    mock_stt.is_model_loaded.return_value = False

    async def body(client):
        resp = await client.delete("/api/models/whisper-tiny")
        assert resp.status == 404
        data = await resp.json()
        assert data["error"]["code"] == "not_loaded"

    client_test(body)


def test_tts_capabilities(mock_stt):
    async def body(client):
        resp = await client.get("/api/tts/capabilities?model=kokoro")
        data = await resp.json()
        assert data["backend"] == "kokoro"
        assert data["capabilities"]["voice_blend"] is True

    client_test(body)


# ── voices ────────────────────────────────────────────────────────────


def test_list_voices(mock_stt):
    async def body(client):
        resp = await client.get("/v1/audio/voices")
        data = await resp.json()
        ids = {v["id"] for v in data["voices"]}
        assert "af_heart" in ids
        assert any(i.startswith("piper/") for i in ids)

    client_test(body)


def test_list_voices_filtered(mock_stt):
    async def body(client):
        resp = await client.get("/v1/audio/voices?model=piper/en_US-amy-medium")
        data = await resp.json()
        assert all(v["id"].startswith("piper/") for v in data["voices"])

    client_test(body)


def test_voice_presets(mock_stt):
    async def body(client):
        resp = await client.get("/api/voice-presets")
        data = await resp.json()
        assert len(data["presets"]) >= 3
        assert any(p["name"] == "Will" for p in data["presets"])

    client_test(body)


def test_voice_presets_from_yaml(tmp_path, monkeypatch):
    """TTS_VOICES_CONFIG yaml overrides the built-in presets
    (reference tests/test_voice_presets.py yaml-load behaviors)."""
    from open_speech_tpu.server.app import (
        DEFAULT_VOICE_PRESETS,
        _load_voice_presets,
    )

    cfg = tmp_path / "voices.yml"
    cfg.write_text(
        "presets:\n"
        "  - name: Test\n"
        "    voice: af_heart\n"
        "    speed: 1.2\n"
        "    description: Test preset\n"
    )
    monkeypatch.setenv("TTS_VOICES_CONFIG", str(cfg))
    presets = _load_voice_presets()
    assert len(presets) == 1 and presets[0]["name"] == "Test"

    # bare-list yaml is accepted too
    cfg.write_text("- name: Solo\n  voice: am_puck\n")
    assert _load_voice_presets()[0]["name"] == "Solo"

    # missing file and malformed yaml both fall back to defaults
    monkeypatch.setenv("TTS_VOICES_CONFIG", str(tmp_path / "absent.yml"))
    assert _load_voice_presets() == DEFAULT_VOICE_PRESETS
    cfg.write_text(":: not yaml [")
    monkeypatch.setenv("TTS_VOICES_CONFIG", str(cfg))
    assert _load_voice_presets() == DEFAULT_VOICE_PRESETS


# ── TTS speech ────────────────────────────────────────────────────────


def test_speech_validation_errors(mock_stt):
    async def body(client):
        # empty input
        resp = await client.post(
            "/v1/audio/speech",
            json={"input": "  ", "model": "kokoro", "response_format": "wav"},
        )
        assert resp.status == 400
        # bad format
        resp = await client.post(
            "/v1/audio/speech",
            json={"input": "hi", "model": "kokoro", "response_format": "xyz"},
        )
        assert resp.status == 400
        assert "Invalid response_format" in (await resp.json())["error"]["message"]
        # voice_design unsupported by kokoro
        resp = await client.post(
            "/v1/audio/speech",
            json={
                "input": "hi",
                "model": "kokoro",
                "response_format": "wav",
                "voice_design": "deep voice",
            },
        )
        assert resp.status == 400
        assert "voice_design" in (await resp.json())["error"]["message"]

    client_test(body)


def test_speech_too_long(mock_stt, monkeypatch):
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "tts_max_input_length", 10)

    async def body(client):
        resp = await client.post(
            "/v1/audio/speech",
            json={"input": "x" * 50, "model": "kokoro", "response_format": "wav"},
        )
        assert resp.status == 400
        assert "Input too long" in (await resp.json())["error"]["message"]

    client_test(body)


def test_speech_wav_synthesis(mock_stt):
    """Full path: real kokoro backend -> WAV bytes."""

    async def body(client):
        resp = await client.post(
            "/v1/audio/speech",
            json={
                "input": "Hello.",
                "model": "kokoro",
                "voice": "af_heart",
                "response_format": "wav",
            },
        )
        assert resp.status == 200, await resp.text()
        body_bytes = await resp.read()
        assert body_bytes[:4] == b"RIFF"
        audio, sr = codec.read_wav(body_bytes)
        assert sr == 24000
        assert len(audio) > 1000

    client_test(body)


# ── voice library ─────────────────────────────────────────────────────


def test_voice_library_crud(mock_stt):
    async def body(client):
        wav = _wav_bytes()
        form = FormData()
        form.add_field("name", "Test Voice")
        form.add_field("audio", wav, filename="v.wav", content_type="audio/wav")
        resp = await client.post("/api/voices/library", data=form)
        assert resp.status == 201
        meta = await resp.json()
        assert meta["name"] == "test_voice"

        resp = await client.get("/api/voices/library")
        voices = await resp.json()
        assert any(v["name"] == "test_voice" for v in voices)

        resp = await client.get("/api/voices/library/test_voice")
        assert resp.status == 200

        resp = await client.delete("/api/voices/library/test_voice")
        assert resp.status == 204

        resp = await client.get("/api/voices/library/test_voice")
        assert resp.status == 404

    client_test(body)


def test_voice_library_rejects_non_wav(mock_stt):
    async def body(client):
        form = FormData()
        form.add_field("name", "bad")
        form.add_field("audio", b"not wav data", filename="b.mp3",
                       content_type="audio/mpeg")
        resp = await client.post("/api/voices/library", data=form)
        assert resp.status == 422
        assert "WAV" in (await resp.json())["error"]["message"]

    client_test(body)


# ── error envelope + security ─────────────────────────────────────────


def test_error_envelope_shape(mock_stt):
    mock_stt.transcribe.side_effect = RuntimeError("boom")

    async def body(client):
        form = FormData()
        form.add_field("file", _wav_bytes(), filename="t.wav",
                       content_type="audio/wav")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 500
        data = await resp.json()
        assert set(data["error"]) >= {"message", "code"}
        assert "boom" in data["error"]["message"]

    client_test(body)


def test_auth_required(mock_stt, monkeypatch):
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "os_api_key", "secret123")

    async def body(client):
        resp = await client.get("/v1/models")
        assert resp.status == 401
        # health is exempt
        resp = await client.get("/health")
        assert resp.status == 200
        # bearer works
        resp = await client.get(
            "/v1/models", headers={"Authorization": "Bearer secret123"}
        )
        assert resp.status == 200
        # query param works (deprecated)
        resp = await client.get("/v1/models?api_key=secret123")
        assert resp.status == 200
        # wrong key rejected
        resp = await client.get(
            "/v1/models", headers={"Authorization": "Bearer wrong"}
        )
        assert resp.status == 401

    client_test(body)


def test_rate_limit(mock_stt, monkeypatch):
    from open_speech_tpu.config import settings
    from open_speech_tpu.server import middleware

    monkeypatch.setattr(settings, "os_rate_limit", 2)
    monkeypatch.setattr(settings, "os_rate_limit_burst", 2)
    middleware.reset_rate_limiter()

    async def body(client):
        r1 = await client.get("/v1/models")
        assert r1.status == 200
        assert "X-RateLimit-Remaining" in r1.headers
        r2 = await client.get("/v1/models")
        r3 = await client.get("/v1/models")
        assert r3.status == 429
        assert "Retry-After" in r3.headers

    try:
        client_test(body)
    finally:
        middleware.reset_rate_limiter()


def test_stream_endpoint_upgrade_required(mock_stt):
    async def body(client):
        resp = await client.get("/v1/audio/stream")
        assert resp.status == 426
        data = await resp.json()
        assert data["error"]["code"] == "websocket_upgrade_required"

    client_test(body)


def test_ui_orchestration_cycle(mock_stt):
    """The web UI's ensureModelReady flow: status -> load -> status(loaded)
    -> unload (reference: tests/test_ui_model_orchestration.py shape)."""
    from open_speech_tpu.schemas import LoadedModelInfo

    loaded: list[str] = []
    mock_stt.is_model_loaded.side_effect = lambda m: m in loaded
    mock_stt.load_model.side_effect = lambda m: loaded.append(m)
    mock_stt.unload_model.side_effect = lambda m: loaded.remove(m)
    mock_stt.loaded_models.side_effect = lambda: [
        LoadedModelInfo(
            model=m, backend="jax-whisper", device="tpu",
            compute_type="int8", loaded_at=0.0,
        )
        for m in loaded
    ]

    async def body(client):
        resp = await client.get("/api/models/whisper-tiny/status")
        assert (await resp.json())["state"] != "loaded"
        resp = await client.post("/api/models/whisper-tiny/load")
        assert resp.status == 200
        resp = await client.get("/api/models/whisper-tiny/status")
        assert (await resp.json())["state"] == "loaded"
        resp = await client.delete("/api/models/whisper-tiny")
        assert resp.status == 200
        resp = await client.get("/api/models/whisper-tiny/status")
        assert (await resp.json())["state"] != "loaded"

    client_test(body)


def test_download_endpoint_marks_downloaded(mock_stt):
    loaded: list[str] = []
    mock_stt.is_model_loaded.side_effect = lambda m: m in loaded
    mock_stt.load_model.side_effect = lambda m: loaded.append(m)
    mock_stt.unload_model.side_effect = lambda m: loaded.remove(m)
    mock_stt.loaded_models.side_effect = lambda: []

    async def body(client):
        resp = await client.post("/api/models/whisper-tiny/download")
        assert resp.status == 200
        # download = load + unload: model ends NOT loaded
        assert loaded == []

    client_test(body)


def test_unknown_model_404(mock_stt):
    mock_stt.transcribe.side_effect = ValueError("Unknown whisper model id: x")

    async def body(client):
        resp = await client.post(
            "/v1/audio/transcriptions",
            data={"file": _wav_bytes(), "model": "nonexistent-model-xyz"},
        )
        assert resp.status == 404
        assert (await resp.json())["error"]["code"] == "model_not_found"

    client_test(body)
