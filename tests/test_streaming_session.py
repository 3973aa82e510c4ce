"""Streaming WS session lifecycle with scripted fake sockets + LocalAgreement2.

Mirrors reference tests/test_streaming_session_runtime.py (DummyWS pattern)
and tests/test_streaming_units.py (pure-fn units).
"""

import asyncio
import json
from unittest.mock import MagicMock

import numpy as np
import pytest

from aiohttp import WSMsgType

from open_speech_tpu.server.streaming import (
    INTERNAL_SAMPLE_RATE,
    LocalAgreement2,
    StreamingSession,
)


class FakeMsg:
    def __init__(self, type_, data):
        self.type = type_
        self.data = data


class DummyWS:
    """Scripted message queue driving a full session lifecycle."""

    def __init__(self, messages):
        self._messages = list(messages)
        self.sent: list[dict] = []
        self.closed = False

    def __aiter__(self):
        return self

    async def __anext__(self):
        if not self._messages:
            raise StopAsyncIteration
        return self._messages.pop(0)

    async def send_str(self, text):
        self.sent.append(json.loads(text))

    async def close(self, code=1000, message=b""):
        self.closed = True


def _patch_router(monkeypatch, text="hello world"):
    from open_speech_tpu.server import streaming as S

    mock = MagicMock()
    mock.is_model_loaded.return_value = True
    mock.transcribe.return_value = {"text": text}
    monkeypatch.setattr(S, "backend_router", mock)
    return mock


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def _pcm(ms: int, value: int = 1000) -> bytes:
    n = INTERNAL_SAMPLE_RATE * ms // 1000
    return (np.ones(n, dtype=np.int16) * value).tobytes()


# ── LocalAgreement2 units (reference: tests/test_streaming_units.py) ──


def test_agreement_confirms_common_prefix():
    agg = LocalAgreement2()
    confirmed, pending = agg.process("hello world")
    assert confirmed == []
    assert pending == ["hello", "world"]
    confirmed, pending = agg.process("hello world again")
    assert confirmed == ["hello", "world"]
    assert pending == ["again"]


def test_agreement_case_insensitive_match():
    agg = LocalAgreement2()
    agg.process("Hello World")
    confirmed, _ = agg.process("hello world more")
    assert confirmed == ["hello", "world"]


def test_agreement_divergence_resets_pending():
    agg = LocalAgreement2()
    agg.process("the cat sat")
    confirmed, pending = agg.process("the dog ran")
    assert confirmed == ["the"]
    assert pending == ["dog", "ran"]


def test_agreement_flush():
    agg = LocalAgreement2()
    agg.process("one two three")
    remaining = agg.flush()
    assert remaining == ["one", "two", "three"]
    assert agg.confirmed_words == ["one", "two", "three"]


def test_agreement_empty_text():
    agg = LocalAgreement2()
    confirmed, pending = agg.process("   ")
    assert confirmed == [] and pending == []


# ── session lifecycle ─────────────────────────────────────────────────


def test_session_stop_message(monkeypatch):
    _patch_router(monkeypatch)
    ws = DummyWS([FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))])
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    types = [e["type"] for e in ws.sent]
    assert types[0] == "session.begin"
    assert types[-1] == "session.end"
    end = ws.sent[-1]
    assert end["reason"] == "client_stop"


def test_session_vad_disabled_transcribes(monkeypatch):
    mock = _patch_router(monkeypatch)
    # 300ms of audio in one binary frame -> 3 chunks at 100ms
    # 350ms: 3 full chunks + 50ms residue so _flush finalizes (reference
    # semantics: flush only acts on leftover buffered bytes)
    ws = DummyWS(
        [
            FakeMsg(WSMsgType.BINARY, _pcm(350)),
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert mock.transcribe.called
    transcripts = [e for e in ws.sent if e["type"] == "transcript"]
    assert transcripts  # interim or final emitted
    # flush on stop produced a speech_final transcript
    assert any(t.get("speech_final") for t in transcripts)


def test_session_model_load_failure(monkeypatch):
    from open_speech_tpu.server import streaming as S

    mock = MagicMock()
    mock.is_model_loaded.return_value = False
    mock.load_model.side_effect = RuntimeError("no such model")
    monkeypatch.setattr(S, "backend_router", mock)
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="bad", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert ws.sent[0]["type"] == "error"
    assert "Failed to load model" in ws.sent[0]["message"]


def test_session_transcription_error_event(monkeypatch):
    from open_speech_tpu.server import streaming as S

    mock = MagicMock()
    mock.is_model_loaded.return_value = True
    mock.transcribe.side_effect = RuntimeError("backend exploded")
    monkeypatch.setattr(S, "backend_router", mock)
    ws = DummyWS(
        [
            FakeMsg(WSMsgType.BINARY, _pcm(200)),
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    errors = [e for e in ws.sent if e["type"] == "error"]
    assert errors
    end = ws.sent[-1]
    assert end["type"] == "session.end"
    assert end["errors"] >= 1


def test_session_odd_byte_frame(monkeypatch):
    mock = _patch_router(monkeypatch)
    ws = DummyWS(
        [
            FakeMsg(WSMsgType.BINARY, _pcm(100) + b"\x01"),  # odd trailing byte
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())  # must not crash
    assert ws.sent[-1]["type"] == "session.end"


def test_session_malformed_json_ignored(monkeypatch):
    _patch_router(monkeypatch)
    ws = DummyWS(
        [
            FakeMsg(WSMsgType.TEXT, "{not json"),
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert ws.sent[-1]["type"] == "session.end"


def test_session_resamples_other_rates(monkeypatch):
    mock = _patch_router(monkeypatch)
    ws = DummyWS(
        [
            # 48kHz frames: chunk is 4800 samples per 100ms
            FakeMsg(
                WSMsgType.BINARY,
                (np.ones(4800 * 3, dtype=np.int16) * 500).tobytes(),
            ),
            FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"})),
        ]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=48000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    assert session.needs_resample
    _run(session.run())
    assert mock.transcribe.called
    # transcribed audio was resampled to 16k WAV
    wav = mock.transcribe.call_args.kwargs["audio"]
    assert wav[:4] == b"RIFF"
    assert int.from_bytes(wav[24:28], "little") == INTERNAL_SAMPLE_RATE


def test_config_message_retunes_session(monkeypatch):
    """{"type":"config"} updates sample_rate/language/interim mid-session
    (documented in the reference protocol but unimplemented there —
    reference: src/streaming.py:266-273)."""
    _patch_router(monkeypatch)
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(
        session._handle_text(
            '{"type":"config","sample_rate":8000,"language":"de",'
            '"interim_results":false}'
        )
    )
    assert session.client_sample_rate == 8000
    assert session.needs_resample is True
    assert session.chunk_bytes == int(8000 * 0.1) * 2  # 100ms default chunk
    assert session.language == "de"
    assert session.interim_results is False


def test_session_model_load_failure_still_ends_session(monkeypatch):
    """Even a model-load failure terminates with session.end, not a bare
    socket drop (clients key teardown on it)."""
    from open_speech_tpu.server import streaming as S

    mock = MagicMock()
    mock.is_model_loaded.return_value = False
    mock.load_model.side_effect = RuntimeError("no such model")
    monkeypatch.setattr(S, "backend_router", mock)
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="bad", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert [e["type"] for e in ws.sent] == ["error", "session.end"]
    assert ws.sent[1]["reason"] == "model_load_failed"


def test_config_rejects_out_of_range_sample_rate(monkeypatch):
    """A config message cannot set a rate the connect path would reject —
    an accepted tiny rate would zero chunk_bytes and spin the loop."""
    _patch_router(monkeypatch)
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    for bad in (1, 0, -5, 7999, 1_000_000, "nope"):
        _run(session._handle_text(
            json.dumps({"type": "config", "sample_rate": bad})
        ))
        assert session.client_sample_rate == 16000
        assert session.chunk_bytes > 0
    assert all(e["type"] == "error" for e in ws.sent)


def test_config_rate_switch_rebases_clock_and_flushes(monkeypatch):
    """Switching rates mid-stream keeps elapsed time continuous and
    finalizes audio captured at the old rate."""
    _patch_router(monkeypatch, text="before switch")
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=False, endpointing_ms=300, vad_enabled=False,
    )

    async def drive():
        await session._handle_audio(_pcm(200))  # 200 ms at 16 kHz
        await session._handle_text('{"type":"config","sample_rate":8000}')

    _run(drive())
    # 0.2 s at 16 kHz == 1600 samples at 8 kHz
    assert session.client_sample_rate == 8000
    assert session.total_samples == 1600
    # in-flight utterance finalized at the switch
    finals = [e for e in ws.sent if e.get("is_final")]
    assert finals and finals[-1]["speech_final"]


def test_mulaw_encoding_decoded_at_ingress(monkeypatch):
    """?encoding=mulaw frames are G.711-decoded before chunking (the
    reference accepts the param and silently ignores it)."""
    from open_speech_tpu.ops.audio import ulaw_encode

    router = _patch_router(monkeypatch, text="telephone words")
    ws = DummyWS([])
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=8000,
        interim_results=False, endpointing_ms=300, vad_enabled=False,
        encoding="mulaw",
    )
    pcm = (np.ones(8000, np.int16) * 5000)  # 1 s at 8 kHz
    ulaw = ulaw_encode(pcm).tobytes()

    async def drive():
        await session._handle_audio(ulaw)
        await session._flush()

    _run(drive())
    assert router.transcribe.called
    # decoded stream is PCM16: one second of 8 kHz audio was accounted
    assert session.total_samples == 8000
