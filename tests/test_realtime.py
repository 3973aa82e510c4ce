"""Realtime API: event constructors, session config, buffer, session handlers."""

import asyncio
import base64
import json
from unittest.mock import MagicMock

import numpy as np
import pytest

from open_speech_tpu.server.realtime import events
from open_speech_tpu.server.realtime.audio_buffer import (
    InputAudioBuffer,
    decode_audio_to_pcm16,
    encode_pcm16_to_format,
)
from open_speech_tpu.server.realtime.server import RealtimeSession
from open_speech_tpu.server.realtime.session import SessionConfig


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


# ── events ────────────────────────────────────────────────────────────


def test_event_ids_and_shapes():
    e = events.session_created({"id": "s"})
    assert e["type"] == "session.created"
    assert e["event_id"].startswith("evt_")
    err = events.error("bad", code="x", event_id="evt_1")
    assert err["error"]["code"] == "x"
    assert err["error"]["event_id"] == "evt_1"
    d = events.response_audio_delta("r", "i", 0, 0, "AAAA")
    assert d["delta"] == "AAAA"
    assert events._item_id().startswith("item_")
    assert events._response_id().startswith("resp_")


# ── session config ────────────────────────────────────────────────────


def test_session_config_defaults():
    cfg = SessionConfig()
    assert cfg.voice == "alloy"
    assert cfg.input_audio_format == "pcm16"
    assert cfg.vad_enabled is True
    d = cfg.to_dict()
    assert d["object"] == "realtime.session"
    assert d["modalities"] == ["audio", "text"]


def test_session_config_update():
    cfg = SessionConfig()
    cfg.update_from(
        {
            "session": {
                "voice": "nova",
                "input_audio_format": "g711_ulaw",
                "output_audio_format": "bogus",  # invalid: ignored
                "turn_detection": {"threshold": 0.8, "silence_duration_ms": 900},
            }
        }
    )
    assert cfg.voice == "nova"
    assert cfg.input_audio_format == "g711_ulaw"
    assert cfg.output_audio_format == "pcm16"
    assert cfg.turn_detection.threshold == 0.8
    assert cfg.turn_detection.silence_duration_ms == 900


def test_session_config_disable_vad():
    cfg = SessionConfig()
    cfg.update_from({"session": {"turn_detection": None}})
    assert cfg.vad_enabled is False


# ── audio format conversion ───────────────────────────────────────────


def test_decode_pcm16_resamples_24k_to_16k():
    pcm24 = (np.ones(2400, dtype=np.int16) * 1000).tobytes()  # 100ms @24k
    out = decode_audio_to_pcm16(pcm24, "pcm16", 16000)
    assert len(out) == 1600 * 2  # 100ms @16k


def test_g711_roundtrip():
    pcm8 = (np.linspace(-20000, 20000, 800).astype(np.int16)).tobytes()
    for fmt in ("g711_ulaw", "g711_alaw"):
        encoded = encode_pcm16_to_format(pcm8, 8000, fmt)
        assert len(encoded) == 800  # 1 byte/sample at 8k
        decoded = decode_audio_to_pcm16(encoded, fmt, 8000)
        orig = np.frombuffer(pcm8, dtype=np.int16).astype(np.float32)
        back = np.frombuffer(decoded, dtype=np.int16).astype(np.float32)
        assert np.corrcoef(orig, back)[0, 1] > 0.99


def test_decode_unknown_format():
    with pytest.raises(ValueError):
        decode_audio_to_pcm16(b"xx", "mp3")


# ── input buffer ──────────────────────────────────────────────────────


def test_buffer_overflow():
    buf = InputAudioBuffer(max_buffer_bytes=100)
    with pytest.raises(BufferError):
        buf.append(b"\x00" * 200)
    buf2 = InputAudioBuffer(max_buffer_bytes=100)
    buf2.append(b"\x00" * 60)
    with pytest.raises(BufferError):
        buf2.append(b"\x00" * 60)


def test_buffer_commit_clears():
    buf = InputAudioBuffer()
    buf.append(b"\x01\x02" * 100)
    data = buf.commit()
    assert len(data) == 200
    assert buf.get_audio() == b""


def test_buffer_vad_events_scripted():
    probs = iter([0.9, 0.9, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])

    class FakeVAD:
        def __call__(self, audio):
            return next(probs)

    buf = InputAudioBuffer(vad=FakeVAD(), threshold=0.5, silence_duration_ms=200)
    chunk = b"\x00" * (1600 * 2)  # 100ms @16k
    all_events = []
    for _ in range(9):
        all_events.extend(buf.append(chunk))
    types = [e["type"] for e in all_events]
    assert types == ["speech_started", "speech_stopped"]


# ── session handlers with fake ws ─────────────────────────────────────


class FakeWS:
    def __init__(self):
        self.sent = []
        self.closed = False

    async def send_str(self, text):
        self.sent.append(json.loads(text))

    async def close(self, code=1000, message=b""):
        self.closed = True


def _mk_session(monkeypatch, transcript="hi there"):
    from open_speech_tpu.server.realtime import server as rt

    stt = MagicMock()
    stt.transcribe.return_value = {"text": transcript}
    monkeypatch.setattr(rt, "stt_router", stt)
    tts = MagicMock()
    tts.synthesize.return_value = iter(
        [np.ones(2400, np.float32) * 0.1]
    )
    tts.get_backend.return_value = MagicMock(sample_rate=24000)
    ws = FakeWS()
    session = RealtimeSession(ws, tts, model="whisper-tiny")
    # no VAD in unit tests: set config turn_detection off
    session.config.turn_detection = None
    return session, ws, stt, tts


def test_realtime_initialize_sends_session_created(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    assert ws.sent[0]["type"] == "session.created"
    assert ws.sent[0]["session"]["id"].startswith("sess_")


def test_realtime_unknown_event(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(session.handle_event({"type": "nope.nope"}))
    assert ws.sent[-1]["type"] == "error"
    assert ws.sent[-1]["error"]["code"] == "unknown_event"


def test_realtime_append_and_commit_transcribes(monkeypatch):
    session, ws, stt, _ = _mk_session(monkeypatch)
    _run(session.initialize())
    pcm24 = (np.ones(4800, dtype=np.int16) * 1000).tobytes()  # 200ms @24k
    audio_b64 = base64.b64encode(pcm24).decode()
    _run(
        session.handle_event(
            {"type": "input_audio_buffer.append", "audio": audio_b64}
        )
    )
    _run(session.handle_event({"type": "input_audio_buffer.commit"}))
    types = [e["type"] for e in ws.sent]
    assert "input_audio_buffer.committed" in types
    assert "conversation.item.created" in types
    assert (
        "conversation.item.input_audio_transcription.completed" in types
    )
    done = [
        e for e in ws.sent
        if e["type"] == "conversation.item.input_audio_transcription.completed"
    ][0]
    assert done["transcript"] == "hi there"
    # transcription got a 16k WAV
    wav = stt.transcribe.call_args.kwargs["audio"]
    assert wav[:4] == b"RIFF"


def test_realtime_append_invalid_base64(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(
        session.handle_event(
            {"type": "input_audio_buffer.append", "audio": "!!notb64!!"}
        )
    )
    assert ws.sent[-1]["type"] == "error"
    assert ws.sent[-1]["error"]["code"] == "invalid_audio"


def test_realtime_response_create_tts(monkeypatch):
    session, ws, _, tts = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(
        session.handle_event(
            {"type": "response.create", "response": {"instructions": "say hi"}}
        )
    )
    types = [e["type"] for e in ws.sent]
    assert "response.created" in types
    assert "response.audio.delta" in types
    assert "response.audio.done" in types
    assert types[-1] == "response.done"
    done = ws.sent[-1]["response"]
    assert done["status"] == "completed"
    delta = [e for e in ws.sent if e["type"] == "response.audio.delta"][0]
    base64.b64decode(delta["delta"])  # valid b64


def test_realtime_response_create_text_only_rejected(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(
        session.handle_event(
            {"type": "response.create", "response": {"modalities": ["text"]}}
        )
    )
    assert ws.sent[-1]["error"]["code"] == "unsupported_modality"


def test_realtime_response_create_no_text(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(session.handle_event({"type": "response.create", "response": {}}))
    assert ws.sent[-1]["error"]["code"] == "missing_input"


def test_realtime_buffer_clear(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(session.handle_event({"type": "input_audio_buffer.clear"}))
    assert ws.sent[-1]["type"] == "input_audio_buffer.cleared"


def test_realtime_session_update(monkeypatch):
    session, ws, *_ = _mk_session(monkeypatch)
    _run(session.initialize())
    _run(
        session.handle_event(
            {
                "type": "session.update",
                "session": {"voice": "shimmer", "turn_detection": None},
            }
        )
    )
    updated = ws.sent[-1]
    assert updated["type"] == "session.updated"
    assert updated["session"]["voice"] == "shimmer"
    assert updated["session"]["turn_detection"] is None


def test_response_cancel_preempts_streaming(monkeypatch):
    """response.cancel must take effect while deltas stream: the endpoint
    runs response.create concurrently so the receive loop keeps draining
    (round-2 review fix — previously the cancel frame sat unread)."""
    import asyncio as _asyncio

    from aiohttp import WSMsgType as _WST

    from open_speech_tpu.server.realtime.server import realtime_endpoint

    class SlowTTS:
        def get_backend(self, model):
            class B:
                sample_rate = 24000
            return B()

        def synthesize(self, **kw):
            import time as _t

            for _ in range(50):
                _t.sleep(0.05)  # slow producer: cancel arrives mid-stream
                yield np.ones(2400, np.float32) * 0.1

    class Msg:
        def __init__(self, type_, data=None):
            self.type = type_
            self.data = data

    class WS:
        def __init__(self):
            self.sent = []
            self._queue = [
                Msg(_WST.TEXT, json.dumps({
                    "type": "response.create",
                    "response": {"instructions": "cancel me"},
                })),
                Msg(_WST.TEXT, json.dumps({"type": "response.cancel"})),
            ]

        async def receive(self, timeout=None):
            if self._queue:
                await _asyncio.sleep(0.2)  # let deltas start
                return self._queue.pop(0)
            await _asyncio.sleep(1.0)  # give the task time to drain
            return Msg(_WST.CLOSE)

        async def send_str(self, s):
            self.sent.append(json.loads(s))

        async def close(self, **kw):
            pass

    ws = WS()

    _run(realtime_endpoint(ws, SlowTTS()))
    types = [e["type"] for e in ws.sent]
    deltas = types.count("response.audio.delta")
    # streaming started, then stopped well before the 50-chunk total
    assert "response.created" in types
    assert deltas < 40
    # the lifecycle still terminates: a cancelled response must emit
    # response.done with status "cancelled" (clients block on it)
    dones = [e for e in ws.sent if e["type"] == "response.done"]
    assert dones and dones[-1]["response"]["status"] == "cancelled"


def test_realtime_autodetect_pins_language(monkeypatch):
    """A session without a pinned language probes detect_language_pcm once
    on a >=1 s commit and pins the result for later commits (mirrors the
    streaming session's detect-once policy)."""
    from open_speech_tpu.server.realtime import server as rt

    session, ws, stt, _ = _mk_session(monkeypatch)
    monkeypatch.setattr(rt.settings, "os_batcher_enabled", True)
    backend = MagicMock()
    backend.detect_language_pcm.return_value = "fr"
    stt.get_backend.return_value = backend

    async def fake_batched(self, audio, model, language):
        fake_batched.calls.append(language)
        return {"text": "bonjour"}

    fake_batched.calls = []
    monkeypatch.setattr(
        rt.RealtimeSession, "_transcribe_batched", fake_batched
    )
    _run(session.initialize())
    pcm24 = (np.ones(36000, dtype=np.int16) * 1000).tobytes()  # 1.5s @24k
    audio_b64 = base64.b64encode(pcm24).decode()
    _run(
        session.handle_event(
            {"type": "input_audio_buffer.append", "audio": audio_b64}
        )
    )
    _run(session.handle_event({"type": "input_audio_buffer.commit"}))
    assert session._detected_language == "fr"
    assert backend.detect_language_pcm.call_count == 1
    assert fake_batched.calls == ["fr"]
    # second commit reuses the pin without re-probing
    _run(
        session.handle_event(
            {"type": "input_audio_buffer.append", "audio": audio_b64}
        )
    )
    _run(session.handle_event({"type": "input_audio_buffer.commit"}))
    assert backend.detect_language_pcm.call_count == 1
    assert fake_batched.calls == ["fr", "fr"]


def test_realtime_probe_failure_keeps_executor_path(monkeypatch):
    """Backends without detect support fail the probe once; commits keep
    the per-request executor path (no crash, no batcher)."""
    from open_speech_tpu.server.realtime import server as rt

    session, ws, stt, _ = _mk_session(monkeypatch)
    monkeypatch.setattr(rt.settings, "os_batcher_enabled", True)
    stt.get_backend.side_effect = RuntimeError("no backend")
    _run(session.initialize())
    pcm24 = (np.ones(36000, dtype=np.int16) * 1000).tobytes()
    audio_b64 = base64.b64encode(pcm24).decode()
    _run(
        session.handle_event(
            {"type": "input_audio_buffer.append", "audio": audio_b64}
        )
    )
    _run(session.handle_event({"type": "input_audio_buffer.commit"}))
    assert session._lang_probe_failed
    done = [
        e for e in ws.sent
        if e["type"] == "conversation.item.input_audio_transcription.completed"
    ]
    assert done and done[0]["transcript"] == "hi there"
