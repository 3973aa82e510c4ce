"""Streaming sessions through the continuous batcher (OS_BATCHER_ENABLED)."""

import asyncio
import json

import numpy as np
import pytest

from aiohttp import WSMsgType

from open_speech_tpu.config import settings
from open_speech_tpu.server.streaming import StreamingSession


class FakeMsg:
    def __init__(self, type_, data):
        self.type = type_
        self.data = data


class DummyWS:
    def __init__(self, messages):
        self._messages = list(messages)
        self.sent = []

    def __aiter__(self):
        return self

    async def __anext__(self):
        if not self._messages:
            raise StopAsyncIteration
        return self._messages.pop(0)

    async def send_str(self, text):
        self.sent.append(json.loads(text))

    async def close(self, code=1000, message=b""):
        pass


@pytest.fixture
def batched_env(monkeypatch):
    from open_speech_tpu.runtime import batcher_pool
    from open_speech_tpu.server import streaming as S

    monkeypatch.setattr(settings, "os_batcher_enabled", True)
    # exercise the continuous-batcher path specifically (the incremental
    # encoder would otherwise serve the interims)
    monkeypatch.setattr(settings, "os_stream_incremental", False)
    monkeypatch.setattr(settings, "stt_model", "test-tiny")
    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    monkeypatch.setattr(settings, "os_batch_max_sessions", 4)
    batcher_pool.reset_pool()
    # real router with the real jax-whisper backend
    from open_speech_tpu.runtime.router import BackendRouter

    router = BackendRouter()
    monkeypatch.setattr(S, "backend_router", router)
    yield router
    batcher_pool.reset_pool()


def test_streaming_session_via_batcher(batched_env):
    pcm = (np.ones(16000, np.int16) * 2000).tobytes()  # 1s of "speech"
    ws = DummyWS(
        [
            FakeMsg(WSMsgType.BINARY, pcm),
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="test-tiny", language="en", sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )

    async def go():
        await asyncio.wait_for(session.run(), timeout=300)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())
    types = [e["type"] for e in ws.sent]
    assert types[0] == "session.begin"
    assert types[-1] == "session.end"
    assert ws.sent[-1]["errors"] == 0
    assert session._transcription_count >= 1


def test_concurrent_sessions_share_batcher(batched_env):
    from open_speech_tpu.runtime import batcher_pool

    def make_session():
        pcm = (np.ones(8000, np.int16) * 1500).tobytes()
        ws = DummyWS(
            [
                FakeMsg(WSMsgType.BINARY, pcm),
                FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
            ]
        )
        return ws, StreamingSession(
            ws, model="test-tiny", language="en", sample_rate=16000,
            interim_results=True, endpointing_ms=300, vad_enabled=False,
        )

    pairs = [make_session() for _ in range(3)]

    async def go():
        await asyncio.wait_for(
            asyncio.gather(*(s.run() for _ws, s in pairs)), timeout=300
        )

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())
    for ws, session in pairs:
        assert ws.sent[-1]["type"] == "session.end"
        assert ws.sent[-1]["errors"] == 0
    # one shared batcher handled everything
    assert len(batcher_pool._batchers) == 1
    batcher = next(iter(batcher_pool._batchers.values()))
    assert batcher.stats["completed"] >= 3
