"""Python SDK protocol tests against fake servers (reference pattern:
tests/test_client_sdk.py / tests/test_ws_client.py)."""

import asyncio
import json
import threading

import numpy as np
import pytest

from open_speech_tpu.client import OpenSpeechClient


def test_ws_url_scheme():
    c = OpenSpeechClient("https://host:8100")
    assert c._ws_url("/v1/realtime") == "wss://host:8100/v1/realtime"
    c2 = OpenSpeechClient("http://host:8100")
    assert c2._ws_url("/x") == "ws://host:8100/x"


def test_headers_with_api_key():
    c = OpenSpeechClient(api_key="k123")
    assert c._headers() == {"Authorization": "Bearer k123"}
    assert OpenSpeechClient()._headers() == {}


def _fake_stream_server(events_per_session, port_holder, stop_evt):
    """websockets server that mimics /v1/audio/stream."""
    import websockets.sync.server as wss

    def handler(ws):
        ws.send(json.dumps({"type": "session.begin", "session_id": "s1"}))
        received = 0
        for msg in ws:
            if isinstance(msg, bytes):
                received += 1
                ws.send(
                    json.dumps(
                        {
                            "type": "transcript",
                            "is_final": False,
                            "speech_final": False,
                            "text": f"chunk {received}",
                        }
                    )
                )
            else:
                data = json.loads(msg)
                if data.get("type") == "stop":
                    ws.send(json.dumps({"type": "session.end", "reason": "client_stop"}))
                    break

    server = wss.serve(handler, "127.0.0.1", 0)
    port_holder.append(server.socket.getsockname()[1])
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def test_stream_transcribe_against_fake_server():
    port_holder: list[int] = []
    stop = threading.Event()
    server = _fake_stream_server(None, port_holder, stop)
    try:
        client = OpenSpeechClient(f"http://127.0.0.1:{port_holder[0]}")
        chunks = [b"\x00\x01" * 100, b"\x02\x03" * 100]
        events = list(client.stream_transcribe(iter(chunks), vad=False))
        types = [e["type"] for e in events]
        assert types[0] == "session.begin"
        assert types.count("transcript") == 2
        assert types[-1] == "session.end"
        assert events[1]["text"] == "chunk 1"
    finally:
        server.shutdown()


def test_async_stream_transcribe_against_fake_server():
    port_holder: list[int] = []
    server = _fake_stream_server(None, port_holder, None)
    try:
        client = OpenSpeechClient(f"http://127.0.0.1:{port_holder[0]}")

        async def go():
            events = []
            async for e in client.async_stream_transcribe(
                iter([b"\x00" * 64]), vad=True
            ):
                events.append(e)
            return events

        events = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())
        assert events[0]["type"] == "session.begin"
        assert events[-1]["type"] == "session.end"
    finally:
        server.shutdown()


def test_stream_transcribe_reconnect_limit():
    """A server that drops mid-stream exhausts reconnect attempts."""
    import websockets.sync.server as wss

    def handler(ws):
        ws.send(json.dumps({"type": "session.begin"}))
        # read one frame then drop the connection without session.end
        for _msg in ws:
            break

    server = wss.serve(handler, "127.0.0.1", 0)
    port = server.socket.getsockname()[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        client = OpenSpeechClient(f"http://127.0.0.1:{port}")

        def endless():
            while True:
                yield b"\x00" * 32

        with pytest.raises(RuntimeError, match="reconnect"):
            list(
                client.stream_transcribe(endless(), reconnect_attempts=1)
            )
    finally:
        server.shutdown()


def test_stream_transcribe_source_error_surfaces():
    """A failing audio iterator must flush delivered audio, then raise —
    not hang in ws.recv() or silently truncate."""
    port_holder: list[int] = []
    server = _fake_stream_server(None, port_holder, threading.Event())
    try:
        client = OpenSpeechClient(f"http://127.0.0.1:{port_holder[0]}")

        def dying():
            yield b"\x00" * 64
            raise OSError("mic unplugged")

        events = []
        with pytest.raises(OSError, match="mic unplugged"):
            for e in client.stream_transcribe(dying(), vad=False):
                events.append(e)
        types = [e["type"] for e in events]
        # delivered audio was flushed before the error surfaced
        assert "transcript" in types and "session.end" in types
    finally:
        server.shutdown()


def test_stream_transcribe_early_session_end_is_terminal():
    """A server-side abort (session.end before exhaustion) must not
    trigger reconnect-and-replay (duplicated events)."""
    import websockets.sync.server as wss

    begins = []

    def handler(ws):
        begins.append(1)
        ws.send(json.dumps({"type": "session.begin"}))
        ws.send(json.dumps({"type": "error", "message": "model_load_failed"}))
        ws.send(
            json.dumps({"type": "session.end", "reason": "model_load_failed"})
        )

    server = wss.serve(handler, "127.0.0.1", 0)
    port = server.socket.getsockname()[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        client = OpenSpeechClient(f"http://127.0.0.1:{port}")

        def endless():
            while True:
                yield b"\x00" * 32

        events = list(
            client.stream_transcribe(endless(), reconnect_attempts=2)
        )
        types = [e["type"] for e in events]
        assert types.count("session.end") == 1
        assert len(begins) == 1  # no reconnect happened
    finally:
        server.shutdown()
