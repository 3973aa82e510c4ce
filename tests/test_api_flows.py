"""End-to-end API flows: unified model lifecycle, TTS cache, stream TTS, metrics."""

import asyncio

import numpy as np
import pytest

from aiohttp.test_utils import TestClient, TestServer

from open_speech_tpu.config import settings
from open_speech_tpu.ops import audio as codec


def client_test(coro_fn):
    from open_speech_tpu.server.app import create_app

    async def runner():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)

    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        runner()
    )


def test_unified_model_lifecycle_real_backend(monkeypatch):
    """load -> status(loaded) -> transcribe -> unload through /api/models."""
    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    monkeypatch.setattr(settings, "stt_model", "whisper-large-v3-turbo")

    async def body(client):
        resp = await client.post("/api/models/test-tiny/load")
        assert resp.status == 200, await resp.text()
        info = await resp.json()
        assert info["state"] == "loaded"
        assert info["provider"] == "jax-whisper"

        resp = await client.get("/api/models/test-tiny/status")
        assert (await resp.json())["state"] == "loaded"
        resp = await client.get("/api/models/test-tiny/progress")
        assert (await resp.json())["status"] == "ready"

        # loaded model appears in /api/ps and /v1/models
        ps = await (await client.get("/api/ps")).json()
        assert any(m["model"] == "test-tiny" for m in ps["models"])

        resp = await client.delete("/api/models/test-tiny")
        assert resp.status == 200
        assert (await resp.json())["status"] == "unloaded"
        resp = await client.get("/api/models/test-tiny/status")
        assert (await resp.json())["state"] != "loaded"

    client_test(body)


def test_legacy_ps_load_unload(monkeypatch):
    monkeypatch.setattr(settings, "os_precompile_on_load", False)

    async def body(client):
        resp = await client.post("/api/ps/test-tiny")
        assert (await resp.json())["status"] == "loaded"
        resp = await client.delete("/api/ps/test-tiny")
        assert (await resp.json())["status"] == "unloaded"
        resp = await client.delete("/api/ps/test-tiny")
        assert resp.status == 404

    client_test(body)


def test_tts_cache_hit_header(monkeypatch, tmp_path):
    from open_speech_tpu.server import app as app_module
    from open_speech_tpu.cache.tts_cache import TTSCache

    monkeypatch.setattr(settings, "tts_cache_enabled", True)
    monkeypatch.setattr(
        app_module, "tts_cache", TTSCache(str(tmp_path), 10, True)
    )

    async def body(client):
        payload = {
            "input": "Cache me.",
            "model": "kokoro",
            "voice": "af_heart",
            "response_format": "wav",
        }
        r1 = await client.post("/v1/audio/speech", json=payload)
        assert r1.status == 200, await r1.text()
        assert "X-Cache" not in r1.headers
        first = await r1.read()

        r2 = await client.post("/v1/audio/speech", json=payload)
        assert r2.status == 200
        assert r2.headers.get("X-Cache") == "HIT"
        assert await r2.read() == first

        # cache=false bypasses
        r3 = await client.post("/v1/audio/speech?cache=false", json=payload)
        assert "X-Cache" not in r3.headers

    client_test(body)


def test_stream_tts_endpoint_chunks():
    async def body(client):
        resp = await client.post(
            "/v1/audio/speech?stream=true",
            json={
                "input": "Streaming endpoint check with a longer sentence.",
                "model": "kokoro",
                "voice": "af_heart",
                "response_format": "pcm",
            },
        )
        assert resp.status == 200
        body_bytes = await resp.read()
        assert len(body_bytes) > 4800  # >100ms of pcm16 @24k
        # valid PCM16: decodes without error, finite values
        pcm = np.frombuffer(body_bytes, dtype="<i2")
        assert pcm.size == len(body_bytes) // 2

        # streamed requests show up in the TTFA metrics too
        stats = await (await client.get("/api/stats")).json()
        assert stats["counters"].get("tts_requests_total", 0) >= 1
        assert stats["histograms"]["tts_ttfa_seconds"]["count"] >= 1

    client_test(body)


def test_stream_tts_error_before_first_byte_is_a_real_error():
    """A synth failure before any audio byte (e.g. G2P vocab mismatch
    rejection) must return an error envelope, not a clean 200 with
    empty body."""
    import open_speech_tpu.server.app as app_mod

    def boom(**kwargs):
        raise ValueError("text not expressible in checkpoint vocab")

    orig = app_mod.tts_router.synthesize
    app_mod.tts_router.synthesize = boom
    try:
        async def body(client):
            resp = await client.post(
                "/v1/audio/speech?stream=true",
                json={"input": "x", "model": "kokoro",
                      "response_format": "pcm"},
            )
            assert resp.status == 400, await resp.text()
            data = await resp.json()
            assert "vocab" in data["error"]["message"]

        client_test(body)
    finally:
        app_mod.tts_router.synthesize = orig


def test_stream_tts_midstream_error_aborts_not_clean_eof():
    """If synthesis dies after bytes were sent, the transfer is aborted
    (client sees an error/truncation), never a clean end-of-stream."""
    import aiohttp

    import open_speech_tpu.server.app as app_mod

    def half_then_die(**kwargs):
        tone = 0.3 * np.sin(
            2 * np.pi * 440 * np.arange(24000) / 24000
        ).astype(np.float32)
        yield tone  # non-silent: flushes through the trim/normalize PP
        yield tone
        raise RuntimeError("vocoder failure mid-utterance")

    orig = app_mod.tts_router.synthesize
    app_mod.tts_router.synthesize = half_then_die
    try:
        async def body(client):
            got_clean_eof = False
            try:
                resp = await client.post(
                    "/v1/audio/speech?stream=true",
                    json={"input": "x", "model": "kokoro",
                          "response_format": "pcm"},
                )
                assert resp.status == 200  # headers were already sent
                await resp.read()
                got_clean_eof = True
            except (aiohttp.ClientPayloadError,
                    aiohttp.ServerDisconnectedError,
                    aiohttp.ClientOSError):
                pass  # aborted transfer: the correct signal
            assert not got_clean_eof, "mid-stream failure looked like EOF"

        client_test(body)
    finally:
        app_mod.tts_router.synthesize = orig


def test_metrics_after_tts():
    async def body(client):
        await client.post(
            "/v1/audio/speech",
            json={"input": "Metrics.", "model": "kokoro",
                  "response_format": "wav"},
        )
        stats = await (await client.get("/api/stats")).json()
        assert stats["counters"].get("tts_requests_total", 0) >= 1
        hist = stats["histograms"].get("tts_ttfa_seconds")
        assert hist and hist["count"] >= 1 and hist["p50"] > 0
        text = await (await client.get("/metrics")).text()
        assert "open_speech_tts_requests_total" in text
        assert 'open_speech_tts_ttfa_seconds{quantile="0.50"}' in text

    client_test(body)


def test_translations_raw_text(monkeypatch):
    from unittest.mock import MagicMock

    from open_speech_tpu.runtime.router import router

    mock = MagicMock()
    mock.translate.return_value = {"text": "translated!", "raw_text": True}
    original = router._default_backend
    router._default_backend = mock
    try:

        async def body(client):
            from aiohttp import FormData

            tone = np.zeros(1600, np.float32)
            form = FormData()
            form.add_field("file", codec.write_wav(tone, 16000),
                           filename="x.wav", content_type="audio/wav")
            resp = await client.post("/v1/audio/translations", data=form)
            assert "text/plain" in resp.headers["Content-Type"]
            assert (await resp.text()) == "translated!"

        client_test(body)
    finally:
        router._default_backend = original


def test_labeled_gauge_prometheus_format():
    from open_speech_tpu.server.metrics import Metrics

    m = Metrics()
    m.set_gauge('batch_occupancy{batcher="a/en/t"}', 3)
    m.set_gauge('batch_occupancy{batcher="b/en/t"}', 5)
    text = m.prometheus()
    assert text.count("# TYPE open_speech_batch_occupancy gauge") == 1
    assert 'open_speech_batch_occupancy{batcher="a/en/t"} 3' in text
    assert 'open_speech_batch_occupancy{batcher="b/en/t"} 5' in text


def test_profiler_routes_guarded():
    """start twice -> 409; stop without start -> 409 (jax.profiler lifecycle)."""

    async def body(client):
        resp = await client.post("/api/profiler/stop")
        assert resp.status == 409
        resp = await client.post(
            "/api/profiler/start", json={"dir": "/tmp/os_trace_test"}
        )
        assert resp.status == 200
        assert (await resp.json())["status"] == "tracing"
        resp = await client.post("/api/profiler/start")
        assert resp.status == 409
        resp = await client.post("/api/profiler/stop")
        assert resp.status == 200

    client_test(body)
