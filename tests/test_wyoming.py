"""Wyoming TCP server: protocol roundtrip + STT/TTS handlers over a socket."""

import asyncio
import json
from unittest.mock import MagicMock

import numpy as np
import pytest

from open_speech_tpu.server.wyoming.protocol import Event, read_event, write_event
from open_speech_tpu.server.wyoming.server import start_wyoming_server
from open_speech_tpu.tts.backends.base import VoiceInfo


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_protocol_roundtrip():
    async def go():
        reader = asyncio.StreamReader()
        # feed what write_event would produce
        payload = b"\x01\x02\x03"
        header = {
            "type": "audio-chunk",
            "data": {"rate": 16000},
            "payload_length": len(payload),
        }
        reader.feed_data(json.dumps(header).encode() + b"\n" + payload)
        reader.feed_eof()
        event = await read_event(reader)
        assert event.type == "audio-chunk"
        assert event.data["rate"] == 16000
        assert event.payload == payload
        assert await read_event(reader) is None  # EOF

    _run(go())


def _mock_routers(transcript="wyoming says hi"):
    stt = MagicMock()
    stt.transcribe.return_value = {"text": transcript}
    tts = MagicMock()
    tts.synthesize.return_value = iter([np.ones(2400, np.float32) * 0.3])
    tts.get_backend.return_value = MagicMock(sample_rate=24000)
    tts.list_voices.return_value = [
        VoiceInfo(id="af_heart", name="Heart", language="en-us")
    ]
    return stt, tts


def test_wyoming_describe_and_transcribe(monkeypatch):
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "stt_vad_enabled", False)
    stt, tts = _mock_routers()

    async def go():
        server = await start_wyoming_server(stt, tts, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)

        await write_event(writer, Event("describe"))
        info = await asyncio.wait_for(read_event(reader), 10)
        assert info.type == "info"
        assert info.data["asr"][0]["name"] == "open-speech"
        assert info.data["tts"][0]["voices"][0]["name"] == "af_heart"

        # STT: transcribe -> chunks -> stop -> transcript
        await write_event(writer, Event("transcribe", {"name": "whisper-tiny"}))
        pcm = (np.ones(3200, np.int16) * 1000).tobytes()
        await write_event(
            writer,
            Event("audio-chunk", {"rate": 16000, "width": 2, "channels": 1}, pcm),
        )
        await write_event(writer, Event("audio-stop"))
        transcript = await asyncio.wait_for(read_event(reader), 30)
        assert transcript.type == "transcript"
        assert transcript.data["text"] == "wyoming says hi"
        assert stt.transcribe.call_args.kwargs["model"] == "whisper-tiny"

        writer.close()
        server.close()
        await server.wait_closed()

    _run(go())


def test_wyoming_synthesize(monkeypatch):
    stt, tts = _mock_routers()

    async def go():
        server = await start_wyoming_server(stt, tts, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)

        await write_event(
            writer,
            Event("synthesize", {"text": "hi", "voice": {"name": "af_heart"}}),
        )
        events = []
        while True:
            evt = await asyncio.wait_for(read_event(reader), 30)
            events.append(evt)
            if evt.type == "audio-stop":
                break
        types = [e.type for e in events]
        assert types[0] == "audio-start"
        assert types[-1] == "audio-stop"
        chunks = [e for e in events if e.type == "audio-chunk"]
        assert chunks and all(e.data["rate"] == 16000 for e in chunks)
        total = sum(len(e.payload) for e in chunks)
        assert total > 0

        writer.close()
        server.close()
        await server.wait_closed()

    _run(go())


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from open_speech_tpu.models.whisper import PRESETS, init_params
    from open_speech_tpu.runtime.checkpoint import load_params, save_params

    cfg = PRESETS["test-tiny"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_params(tmp_path / "ckpt", params)
    restored = load_params(tmp_path / "ckpt", like=params)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(restored)
    assert all(
        jnp.array_equal(a, b) for a, b in zip(flat1, flat2)
    )


def test_wyoming_vad_segment_extraction(monkeypatch):
    """With VAD enabled, only speech-flagged windows reach the backend
    (reference: src/wyoming/stt_handler.py:43-115)."""
    from open_speech_tpu.config import settings
    from open_speech_tpu.models.vad import silero as vad_mod

    monkeypatch.setattr(settings, "stt_vad_enabled", True)

    class FakeShared:
        session = object()  # handler re-wraps .session in a fresh SileroVAD

    async def fake_get_vad():
        return FakeShared()

    def fake_segments(self, pcm, **kw):
        # claim the middle third is speech
        ms = len(pcm) // 32
        return [vad_mod.Segment(start_ms=ms // 3, end_ms=2 * ms // 3)]

    monkeypatch.setattr(
        "open_speech_tpu.server.wyoming.server.get_vad_model", fake_get_vad
    )
    monkeypatch.setattr(
        vad_mod.SileroVAD, "get_speech_segments", fake_segments
    )
    stt, tts = _mock_routers("segmented transcript")

    async def go():
        server = await start_wyoming_server(stt, tts, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await write_event(writer, Event("transcribe", {}))
        pcm = (np.ones(16000, np.int16) * 1000).tobytes()
        await write_event(
            writer,
            Event("audio-chunk", {"rate": 16000, "width": 2, "channels": 1}, pcm),
        )
        await write_event(writer, Event("audio-stop"))
        transcript = await asyncio.wait_for(read_event(reader), 30)
        assert transcript.data["text"] == "segmented transcript"
        sent_audio = stt.transcribe.call_args.kwargs["audio"]
        # only the speech segment (1/3 of the input) was transcribed
        assert len(sent_audio) < len(pcm)
        writer.close()
        server.close()
        await server.wait_closed()

    _run(go())


def test_wyoming_unknown_event_ignored():
    stt, tts = _mock_routers()

    async def go():
        server = await start_wyoming_server(stt, tts, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await write_event(writer, Event("bogus-event", {"x": 1}))
        await write_event(writer, Event("describe"))
        info = await asyncio.wait_for(read_event(reader), 10)
        assert info.type == "info"  # server survived the unknown event
        writer.close()
        server.close()
        await server.wait_closed()

    _run(go())


def test_wyoming_info_lists_known_models():
    stt, tts = _mock_routers()

    async def go():
        server = await start_wyoming_server(stt, tts, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await write_event(writer, Event("describe"))
        info = await asyncio.wait_for(read_event(reader), 10)
        models = info.data["asr"][0]["models"]
        names = {m["name"] for m in models}
        assert any("whisper" in n for n in names)
        assert all(
            {"name", "languages", "installed"} <= set(m) for m in models
        )
        writer.close()
        server.close()
        await server.wait_closed()

    _run(go())


def test_wyoming_pcm_width_conversion():
    """Wyoming audio-chunk `width` 1 (u8) and 4 (s32) must be converted to
    16-bit before transcription, not misread as 16-bit noise."""
    import numpy as np

    from open_speech_tpu.server.wyoming.server import _pcm_to_16bit

    # u8: full-scale ramp centered at 128 → symmetric int16 ramp
    u8 = np.arange(256, dtype=np.uint8)
    out = np.frombuffer(_pcm_to_16bit(u8.tobytes(), 1), dtype="<i2")
    assert out[128] == 0 and out[0] == -32768 and out[255] == 32512
    # s32: top 16 bits survive
    s32 = np.array([0, 1 << 16, -(1 << 16), (1 << 31) - 1], dtype="<i4")
    out = np.frombuffer(_pcm_to_16bit(s32.tobytes(), 4), dtype="<i2")
    assert list(out) == [0, 1, -1, 32767]
    # trailing partial sample is dropped, not crashed on
    out = np.frombuffer(_pcm_to_16bit(s32.tobytes() + b"\x01", 4), dtype="<i2")
    assert len(out) == 4
    try:
        _pcm_to_16bit(b"\x00\x00\x00", 3)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("width=3 must raise")
