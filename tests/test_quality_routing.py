"""Quality-vs-latency decode routing (round-1 VERDICT item 6).

Policy (documented in config.py stt_rest_beam_size):
  - REST `/v1/audio/transcriptions` decodes with beam_size=5 — the
    reference's quality default (src/backends/faster_whisper.py:235-245).
  - Streaming sessions decode greedily (beam_size=1, no temperature
    fallback) for latency, whether on the executor path or the continuous
    batcher (which is greedy by construction).
"""

import asyncio
from unittest.mock import MagicMock

import numpy as np
import pytest

from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from open_speech_tpu.config import settings
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.runtime.router import router as backend_router
from open_speech_tpu.server.streaming import StreamingSession


def _wav_bytes(duration_s=0.5) -> bytes:
    t = np.arange(int(16000 * duration_s)) / 16000
    return codec.write_wav(
        (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000
    )


@pytest.fixture
def recording_backend():
    original = backend_router._default_backend
    mock = MagicMock()
    mock.name = "jax-whisper"
    mock.transcribe.return_value = {"text": "hello world", "duration": 0.5}
    mock.loaded_models.return_value = []
    mock.list_cached_models.return_value = []
    mock.is_model_loaded.return_value = True
    backend_router._default_backend = mock
    for key in list(backend_router._backends):
        backend_router._backends[key] = mock
    yield mock
    backend_router._default_backend = original
    for key in list(backend_router._backends):
        backend_router._backends[key] = original


def _run(coro_fn):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        coro_fn()
    )


def test_rest_transcription_uses_beam5(recording_backend):
    from open_speech_tpu.server.app import create_app

    async def body():
        async with TestClient(TestServer(create_app())) as client:
            form = FormData()
            form.add_field(
                "file", _wav_bytes(), filename="a.wav",
                content_type="audio/wav",
            )
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200

    _run(body)
    kwargs = recording_backend.transcribe.call_args.kwargs
    assert kwargs["beam_size"] == settings.stt_rest_beam_size == 5


def test_streaming_session_decodes_greedy(recording_backend):
    class _WS:
        sent: list = []

        async def send_str(self, s):
            self.sent.append(s)

    async def body():
        session = StreamingSession(
            ws=_WS(), model="whisper-large-v3-turbo", language=None,
            sample_rate=16000, interim_results=True, endpointing_ms=300,
            vad_enabled=False,
        )
        session.utterance_audio = bytearray(b"\x00\x00" * 16000)
        await session._transcribe_executor()

    _run(body)
    kwargs = recording_backend.transcribe.call_args.kwargs
    assert kwargs["beam_size"] == 1
    assert kwargs["fallback"] is False


def test_rest_beam_size_env_override():
    from open_speech_tpu.config import Settings

    assert Settings(env={"STT_REST_BEAM_SIZE": "1"}).stt_rest_beam_size == 1
    assert Settings(env={}).stt_rest_beam_size == 5
