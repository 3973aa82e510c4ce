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


# ── coalescing interim scheduler + auto-detect pinning (round-4) ──────


def test_interim_coalescing_bounds_decode_count(monkeypatch):
    """Chunks arriving while an interim decode is in flight must coalesce
    into ONE catch-up pass instead of queueing one decode per chunk —
    otherwise a decode slower than the 100 ms cadence pushes interim
    latency unboundedly behind real time (round-3 weak #3)."""
    from open_speech_tpu.server import streaming as S

    calls = []

    async def fake_run(self, final=False):
        calls.append((final, len(self.utterance_audio)))
        await asyncio.sleep(0.05)  # decode slower than chunk arrival
        return {"text": "hello world"}

    _patch_router(monkeypatch)
    monkeypatch.setattr(S.StreamingSession, "_run_transcription", fake_run)

    ws = DummyWS(
        [FakeMsg(WSMsgType.BINARY, _pcm(100)) for _ in range(8)]
        + [FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))]
    )
    session = StreamingSession(
        ws, model="m", language="en", sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    interims = [c for c in calls if not c[0]]
    finals = [c for c in calls if c[0]]
    # 8 chunks while every decode takes 50 ms: far fewer interim decodes
    # than chunks, but at least one ran and chunks were counted coalesced
    assert len(interims) < 8
    assert len(interims) >= 1
    assert session._interims_coalesced >= 1
    # the flush final ran, exactly once, and saw ALL the audio
    assert len(finals) == 1
    assert finals[0][1] == len(_pcm(100)) * 8


def test_interim_catchup_sees_latest_audio(monkeypatch):
    """The coalesced catch-up pass must cover audio that arrived while the
    previous interim was decoding (newest-wins, no stale hypotheses)."""
    from open_speech_tpu.server import streaming as S

    seen = []

    async def fake_run(self, final=False):
        seen.append(len(self.utterance_audio))
        await asyncio.sleep(0.02)
        return {"text": "hi"}

    _patch_router(monkeypatch)
    monkeypatch.setattr(S.StreamingSession, "_run_transcription", fake_run)

    ws = DummyWS(
        [FakeMsg(WSMsgType.BINARY, _pcm(100)) for _ in range(6)]
        + [FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))]
    )
    session = StreamingSession(
        ws, model="m", language="en", sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    # the last pass (the flush final) saw the full utterance
    assert seen[-1] == len(_pcm(100)) * 6
    # passes are monotonically non-decreasing in coverage
    assert seen == sorted(seen)


def test_final_waits_for_inflight_interim(monkeypatch):
    """_finalize_utterance must not race an in-flight interim on the
    incremental-encoder/agreement state: the final's transcript event
    comes after the interim's."""
    from open_speech_tpu.server import streaming as S

    order = []

    async def fake_run(self, final=False):
        order.append(("start", final))
        await asyncio.sleep(0.03 if not final else 0)
        order.append(("end", final))
        return {"text": "hello"}

    _patch_router(monkeypatch)
    monkeypatch.setattr(S.StreamingSession, "_run_transcription", fake_run)

    ws = DummyWS(
        [FakeMsg(WSMsgType.BINARY, _pcm(100)) for _ in range(3)]
        + [FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))]
    )
    session = StreamingSession(
        ws, model="m", language="en", sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    # no interleaving: every start is followed by its own end before the
    # next start (concurrency capped at 1 across interims AND the final)
    for i in range(0, len(order) - 1, 2):
        assert order[i][0] == "start" and order[i + 1][0] == "end"
    assert order[-1] == ("end", True)


def test_autodetect_session_pins_language(monkeypatch):
    """language=None sessions probe detect_language_pcm once after >=1 s of
    speech, pin the result, and pass it to every later transcription
    (round-3 weak #3: auto-detect sessions never reached the batcher)."""
    from open_speech_tpu.server import streaming as S

    mock = _patch_router(monkeypatch)
    backend = MagicMock()
    backend.detect_language_pcm.return_value = "de"
    mock.get_backend.return_value = backend
    monkeypatch.setattr(S.settings, "os_stream_incremental", False)

    ws = DummyWS(
        # 2.35 s of audio -> pin fires once past the 1 s threshold
        [FakeMsg(WSMsgType.BINARY, _pcm(100)) for _ in range(23)]
        + [FakeMsg(WSMsgType.BINARY, _pcm(50))]
        + [FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert session.effective_language == "de"
    assert backend.detect_language_pcm.call_count == 1
    # the final transcription carried the pinned language
    final_kwargs = mock.transcribe.call_args.kwargs
    assert final_kwargs["language"] == "de"


def test_autodetect_probe_failure_stays_on_executor(monkeypatch):
    """Backends without detect support (mocks, plugins) fail the probe
    once; the session keeps transcribing with language=None."""
    from open_speech_tpu.server import streaming as S

    mock = _patch_router(monkeypatch)
    mock.get_backend.side_effect = RuntimeError("no such backend")
    monkeypatch.setattr(S.settings, "os_stream_incremental", False)

    ws = DummyWS(
        [FakeMsg(WSMsgType.BINARY, _pcm(100)) for _ in range(23)]
        + [FakeMsg(WSMsgType.BINARY, _pcm(50))]
        + [FakeMsg(WSMsgType.TEXT, json.dumps({"type": "stop"}))]
    )
    session = StreamingSession(
        ws, model="m", language=None, sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False,
    )
    _run(session.run())
    assert session._lang_probe_failed
    assert session.effective_language is None
    assert mock.transcribe.called
    assert mock.transcribe.call_args.kwargs["language"] is None
