"""API validation/behavior matrices (round-1 test-depth gap).

Format/validation/gating matrices over the speech and transcription
endpoints, mirroring the reference's API test style (tests/test_api.py
with mocked backends) but parametrized across the whole surface.
"""

import asyncio
from unittest.mock import MagicMock

import numpy as np
import pytest

from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from open_speech_tpu.ops import audio as codec


def _run(coro_fn):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        coro_fn()
    )


def _wav(duration_s=0.3) -> bytes:
    t = np.arange(int(16000 * duration_s)) / 16000
    return codec.write_wav(
        (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 16000
    )


@pytest.fixture
def stt_mock():
    from open_speech_tpu.runtime.router import router

    original = router._default_backend
    mock = MagicMock()
    mock.name = "jax-whisper"
    mock.transcribe.return_value = {
        "text": "hello world", "duration": 0.3,
        "segments": [{"id": 0, "start": 0.0, "end": 0.3, "text": "hello world"}],
        "language": "en", "task": "transcribe",
    }
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


def _client_call(fn):
    from open_speech_tpu.server.app import create_app

    async def body():
        async with TestClient(TestServer(create_app())) as client:
            return await fn(client)

    return _run(body)


# ── TTS validation matrix ─────────────────────────────────────────────


@pytest.mark.parametrize("fmt", ["mp3", "wav", "pcm"])
def test_speech_format_accepted(fmt):
    async def fn(client):
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "ok", "model": "kokoro", "voice": "af_heart",
                  "response_format": fmt},
        )
        # ffmpeg formats may be unavailable in CI: wav/pcm must succeed
        if fmt in ("wav", "pcm"):
            assert r.status == 200
        else:
            assert r.status in (200, 500)
        return r.status

    _client_call(fn)


@pytest.mark.parametrize("fmt", ["ogg", "xyz", ""])
def test_speech_format_rejected(fmt):
    async def fn(client):
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "ok", "model": "kokoro", "response_format": fmt},
        )
        assert r.status == 400
        body = await r.json()
        assert "response_format" in body["error"]["message"]

    _client_call(fn)


@pytest.mark.parametrize(
    "payload,code",
    [
        ({"input": "", "model": "kokoro"}, 400),  # empty
        ({"input": "   ", "model": "kokoro"}, 400),  # whitespace
        ({"input": "x" * 5000, "model": "kokoro"}, 400),  # too long
        ({"model": "kokoro"}, 422),  # missing input
        ({"input": "ok", "model": "kokoro", "speed": 9.0}, 422),  # speed cap
    ],
)
def test_speech_validation_matrix(payload, code):
    async def fn(client):
        r = await client.post("/v1/audio/speech", json=payload)
        assert r.status == code, await r.text()

    _client_call(fn)


def test_speech_voice_design_rejected_for_incapable_backend():
    async def fn(client):
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "ok", "model": "kokoro",
                  "voice_design": "a calm narrator"},
        )
        assert r.status == 400
        body = await r.json()
        assert "support" in body["error"]["message"].lower()

    _client_call(fn)


def test_speech_ssml_input_type():
    async def fn(client):
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "<speak>Hi <emphasis>there</emphasis></speak>",
                  "model": "kokoro", "input_type": "ssml",
                  "response_format": "wav"},
        )
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("audio/wav")

    _client_call(fn)


def test_speech_cache_roundtrip(monkeypatch, tmp_path):
    from open_speech_tpu.cache.tts_cache import TTSCache
    from open_speech_tpu.config import settings
    from open_speech_tpu.server import app as app_module

    monkeypatch.setattr(settings, "tts_cache_enabled", True)
    monkeypatch.setattr(
        app_module, "tts_cache", TTSCache(str(tmp_path), 10, True)
    )

    async def fn(client):
        payload = {"input": "cache me twice", "model": "kokoro",
                   "voice": "af_heart", "response_format": "wav"}
        r1 = await client.post("/v1/audio/speech", json=payload)
        assert r1.status == 200
        assert r1.headers.get("X-Cache") != "HIT"
        r2 = await client.post("/v1/audio/speech", json=payload)
        assert r2.status == 200
        assert r2.headers.get("X-Cache") == "HIT"
        assert await r2.read() == await r1.read()

    _client_call(fn)


# ── STT matrix ────────────────────────────────────────────────────────


@pytest.mark.parametrize("fmt", ["json", "verbose_json", "text", "srt", "vtt"])
def test_transcription_response_formats(stt_mock, fmt):
    stt_mock.transcribe.return_value = (
        {"text": "hello world"} if fmt in ("json", "text")
        else {
            "task": "transcribe", "language": "en", "duration": 0.3,
            "text": "hello world",
            "segments": [
                {"id": 0, "seek": 0, "start": 0.0, "end": 0.3,
                 "text": " hello world", "tokens": [], "temperature": 0.0,
                 "avg_logprob": -0.1, "compression_ratio": 1.0,
                 "no_speech_prob": 0.01},
            ],
        }
    )

    async def fn(client):
        form = FormData()
        form.add_field("file", _wav(), filename="a.wav",
                       content_type="audio/wav")
        form.add_field("response_format", fmt)
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 200
        text = await r.text()
        assert "hello world" in text
        if fmt == "srt":
            assert "-->" in text and "," in text.split("-->")[0]
        if fmt == "vtt":
            assert text.startswith("WEBVTT")

    _client_call(fn)


def test_transcription_rejects_empty_file(stt_mock):
    async def fn(client):
        form = FormData()
        form.add_field("file", b"", filename="a.wav",
                       content_type="audio/wav")
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 400

    _client_call(fn)


def test_transcription_temperature_and_prompt_forwarded(stt_mock):
    async def fn(client):
        form = FormData()
        form.add_field("file", _wav(), filename="a.wav",
                       content_type="audio/wav")
        form.add_field("temperature", "0.4")
        form.add_field("prompt", "Context words")
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 200

    _client_call(fn)
    kwargs = stt_mock.transcribe.call_args.kwargs
    assert kwargs["temperature"] == pytest.approx(0.4)
    assert kwargs["prompt"] == "Context words"


def test_translation_endpoint(stt_mock):
    async def fn(client):
        form = FormData()
        form.add_field("file", _wav(), filename="a.wav",
                       content_type="audio/wav")
        r = await client.post("/v1/audio/translations", data=form)
        assert r.status == 200
        assert (await r.json())["text"] == "hello world"

    _client_call(fn)
    stt_mock.translate.assert_called_once()


def test_voices_endpoint_lists_languages():
    async def fn(client):
        r = await client.get("/v1/audio/voices?model=kokoro")
        assert r.status == 200
        voices = (await r.json())["voices"]
        langs = {v["language"] for v in voices}
        assert {"en-us", "es", "ja", "zh"} <= langs
        assert len(voices) == 52

    _client_call(fn)


def test_health_and_metrics_surface():
    async def fn(client):
        h = await (await client.get("/health")).json()
        assert h["status"] == "ok"
        m = await (await client.get("/metrics")).text()
        assert "streaming_sessions_active" in m

    _client_call(fn)


def test_stats_surface_includes_batchers():
    async def fn(client):
        r = await client.get("/api/stats")
        assert r.status == 200
        snap = await r.json()
        assert "batchers" in snap and "tts_batchers" in snap
        assert "streaming_sessions_active" in snap["gauges"]

    _client_call(fn)


def test_models_endpoint_state_fields():
    async def fn(client):
        r = await client.get("/api/models")
        assert r.status == 200
        models = (await r.json())["models"]
        assert models
        for m in models:
            assert {"id", "type", "provider", "state"} <= set(m)
        types = {m["type"] for m in models}
        assert {"stt", "tts"} <= types

    _client_call(fn)


def test_openai_models_listing():
    async def fn(client):
        r = await client.get("/v1/models")
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "list"
        assert any(m["id"].startswith("whisper") for m in body["data"])

    _client_call(fn)
