"""Python SDK (reference: src/client/__init__.py).

Same public surface: sync/async ``transcribe``/``speak``, WS
``stream_transcribe`` with sender thread/task + reconnect-and-replay of the
in-flight chunk, and sync/async Realtime sessions with callback dispatch.
"""

from __future__ import annotations

import asyncio
import base64
import contextlib
import json
import logging
import threading
import time
from collections.abc import AsyncIterator, Callable, Iterator
from typing import Any
from urllib.parse import urlencode

import httpx

logger = logging.getLogger(__name__)


class _ReplaySender:
    """Pumps audio chunks into a WS; replays the in-flight chunk on retry.

    Distinguishes *source* failures (the caller's iterator raised — terminal,
    surfaced to the caller after the final events) from *network* failures
    (ws.send raised — retried with the in-flight chunk replayed). Each pump
    attempt gets its own stop event so an abandoned thread from a previous
    connection can never clobber the live attempt's state (writes are gated
    on its own event, and the live thread owns the shared iterator)."""

    def __init__(self, audio_stream: Iterator[bytes]):
        self._source = iter(audio_stream)
        self._attempt_stop = threading.Event()
        self.pending: bytes | None = None
        self.exhausted = False
        self.error: Exception | None = None
        self.source_error: Exception | None = None

    def pump(self, ws) -> None:
        stop = self._attempt_stop
        try:
            if self.pending is not None:
                ws.send(self.pending)
                self.pending = None
            while not stop.is_set():
                try:
                    chunk = next(self._source)
                except StopIteration:
                    break
                except Exception as exc:  # the caller's iterator died
                    if not stop.is_set():
                        self.source_error = exc
                    break
                if stop.is_set():
                    return
                self.pending = chunk
                ws.send(chunk)
                self.pending = None
            if stop.is_set():
                return
            # a dead source still flushes what was delivered: the server
            # finalizes on "stop" and sends session.end
            self.exhausted = True
            ws.send(json.dumps({"type": "stop"}))
        except Exception as exc:  # pragma: no cover - network timing
            if not stop.is_set():
                self.error = exc

    def stop(self) -> None:
        self._attempt_stop.set()

    def finished_clean(self) -> bool:
        return self.exhausted and self.pending is None

    def reset_for_retry(self) -> None:
        # abandon the previous attempt (its thread holds the old event and
        # stops touching shared state) and arm a fresh one
        self._attempt_stop.set()
        self._attempt_stop = threading.Event()
        self.error = None


class OpenSpeechClient:
    def __init__(
        self,
        base_url: str = "http://localhost:8100",
        api_key: str | None = None,
        ssl_verify: bool = True,
    ):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.ssl_verify = ssl_verify

    def _headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def _ws_url(self, path: str) -> str:
        for http_scheme, ws_scheme in (("https://", "wss://"), ("http://", "ws://")):
            if self.base_url.startswith(http_scheme):
                return ws_scheme + self.base_url[len(http_scheme) :] + path
        return self.base_url + path

    # ── batch STT / TTS ───────────────────────────────────────────────

    def transcribe(self, audio: bytes, model: str = "") -> dict:
        with httpx.Client(
            verify=self.ssl_verify, headers=self._headers(), timeout=60
        ) as c:
            r = c.post(
                f"{self.base_url}/v1/audio/transcriptions",
                files={"file": ("audio.wav", audio, "audio/wav")},
                data={"model": model} if model else {},
            )
            r.raise_for_status()
            return r.json()

    def speak(
        self,
        text: str,
        voice: str = "alloy",
        speed: float = 1.0,
        model: str = "kokoro",
        response_format: str = "mp3",
    ) -> bytes:
        with httpx.Client(
            verify=self.ssl_verify, headers=self._headers(), timeout=60
        ) as c:
            r = c.post(
                f"{self.base_url}/v1/audio/speech",
                json={
                    "model": model,
                    "input": text,
                    "voice": voice,
                    "speed": speed,
                    "response_format": response_format,
                },
            )
            r.raise_for_status()
            return r.content

    async def async_transcribe(self, audio: bytes, model: str = "") -> dict:
        async with httpx.AsyncClient(
            verify=self.ssl_verify, headers=self._headers(), timeout=60
        ) as c:
            r = await c.post(
                f"{self.base_url}/v1/audio/transcriptions",
                files={"file": ("audio.wav", audio, "audio/wav")},
                data={"model": model} if model else {},
            )
            r.raise_for_status()
            return r.json()

    async def async_speak(
        self,
        text: str,
        voice: str = "alloy",
        speed: float = 1.0,
        model: str = "kokoro",
        response_format: str = "mp3",
    ) -> bytes:
        async with httpx.AsyncClient(
            verify=self.ssl_verify, headers=self._headers(), timeout=60
        ) as c:
            r = await c.post(
                f"{self.base_url}/v1/audio/speech",
                json={
                    "model": model,
                    "input": text,
                    "voice": voice,
                    "speed": speed,
                    "response_format": response_format,
                },
            )
            r.raise_for_status()
            return r.content

    # ── streaming STT ─────────────────────────────────────────────────

    def _stream_url(self, model: str, sample_rate: int, vad: bool) -> str:
        params = {"sample_rate": sample_rate, "vad": "true" if vad else "false"}
        if model:
            params = {"model": model, **params}
        # model ids are user input — '&', '#', spaces must not split params
        return f"{self._ws_url('/v1/audio/stream')}?{urlencode(params)}"

    def stream_transcribe(
        self,
        audio_stream: Iterator[bytes],
        model: str = "",
        sample_rate: int = 16000,
        vad: bool = True,
        reconnect_attempts: int = 2,
    ) -> Iterator[dict[str, Any]]:
        """Sync streaming: background sender thread; yields server events.

        On disconnect, reconnects (up to ``reconnect_attempts``) and replays
        the chunk that was in flight.
        """
        try:
            from websockets.exceptions import ConnectionClosed
            from websockets.sync.client import connect
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "websockets package is required for stream_transcribe"
            ) from e

        ws_url = self._stream_url(model, sample_rate, vad)
        headers = self._headers() or None
        sender = _ReplaySender(audio_stream)

        for attempt in range(reconnect_attempts + 2):
            if attempt > reconnect_attempts:
                raise RuntimeError(
                    "stream_transcribe disconnected and reconnection limit reached"
                )
            if attempt:
                time.sleep(min(0.2 * attempt, 1.0))

            session_ended = False
            with connect(ws_url, additional_headers=headers) as ws:
                thread = threading.Thread(
                    target=sender.pump, args=(ws,), daemon=True
                )
                thread.start()
                try:
                    while True:
                        raw = ws.recv()
                        if isinstance(raw, bytes):
                            continue
                        event = json.loads(raw)
                        yield event
                        if event.get("type") == "session.end":
                            session_ended = True
                            sender.stop()
                            break
                except ConnectionClosed:
                    sender.stop()
                finally:
                    thread.join(timeout=1.0)

            if sender.source_error is not None:
                # the caller's iterator raised: surface it (the server was
                # asked to flush, and its final events were yielded above)
                raise sender.source_error
            if session_ended or sender.finished_clean():
                # server closed the session (clean stop OR server-side
                # abort like model_load_failed) — reconnect-and-replay
                # against an identical failure would just duplicate events
                return
            if sender.error and sender.exhausted:
                raise sender.error
            # resuming requires sole ownership of the shared source
            # iterator; a pump thread parked inside next() can't be resumed
            deadline = time.time() + 5.0
            while thread.is_alive() and time.time() < deadline:
                thread.join(timeout=0.25)
            if thread.is_alive():
                raise RuntimeError(
                    "stream_transcribe cannot reconnect: the audio source "
                    "is blocked mid-read"
                )
            sender.reset_for_retry()

    async def async_stream_transcribe(
        self,
        audio_stream: AsyncIterator[bytes] | Iterator[bytes],
        model: str = "",
        sample_rate: int = 16000,
        vad: bool = True,
        reconnect_attempts: int = 2,
    ) -> AsyncIterator[dict[str, Any]]:
        try:
            import websockets
            from websockets.exceptions import ConnectionClosed
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "websockets package is required for async_stream_transcribe"
            ) from e

        ws_url = self._stream_url(model, sample_rate, vad)
        state = {"pending": None, "done": False, "error": None,
                 "source_error": None}

        chunks_gen = None

        async def _chunks():
            if hasattr(audio_stream, "__aiter__"):
                async for chunk in audio_stream:  # type: ignore[union-attr]
                    yield chunk
            else:
                for chunk in audio_stream:  # type: ignore[not-an-iterable]
                    yield chunk

        async def _pump(ws) -> None:
            try:
                if state["pending"] is not None:
                    await ws.send(state["pending"])
                    state["pending"] = None
                while True:
                    try:
                        chunk = await anext(chunks_gen)
                    except StopAsyncIteration:
                        break
                    except Exception as exc:  # the caller's iterator died
                        state["source_error"] = exc
                        break
                    state["pending"] = chunk
                    await ws.send(chunk)
                    state["pending"] = None
                # a dead source still flushes what was delivered
                state["done"] = True
                await ws.send(json.dumps({"type": "stop"}))
            except Exception as exc:  # pragma: no cover
                state["error"] = exc

        for attempt in range(reconnect_attempts + 2):
            if attempt > reconnect_attempts:
                raise RuntimeError(
                    "async_stream_transcribe disconnected and reconnection "
                    "limit reached"
                )
            if attempt:
                await asyncio.sleep(min(0.2 * attempt, 1.0))
            if chunks_gen is None:
                chunks_gen = _chunks()
            headers = list(self._headers().items()) if self._headers() else None
            session_ended = False
            async with websockets.connect(
                ws_url, additional_headers=headers
            ) as ws:
                pump_task = asyncio.create_task(_pump(ws))
                try:
                    async for raw in ws:
                        if isinstance(raw, bytes):
                            continue
                        event = json.loads(raw)
                        yield event
                        if event.get("type") == "session.end":
                            session_ended = True
                            break
                except ConnectionClosed:
                    pass
                finally:
                    if not pump_task.done():
                        with contextlib.suppress(BaseException):
                            await asyncio.wait_for(pump_task, timeout=0.5)
                    if not pump_task.done():
                        pump_task.cancel()
                        with contextlib.suppress(BaseException):
                            await pump_task

                if state["source_error"] is not None:
                    # surface the caller's iterator failure (final events
                    # for the delivered audio were yielded above)
                    raise state["source_error"]
                if session_ended or (
                    state["done"] and state["pending"] is None
                ):
                    # server closed the session (clean stop OR server-side
                    # abort) — reconnecting would duplicate events
                    return
                if state["error"] and state["done"]:
                    raise state["error"]
                state["error"] = None

    # ── realtime sessions ─────────────────────────────────────────────

    def realtime_session(self, model: str = "") -> "RealtimeSession":
        return RealtimeSession(self, model=model)

    async def async_realtime_session(self, model: str = "") -> "AsyncRealtimeSession":
        sess = AsyncRealtimeSession(self, model=model)
        await sess.connect()
        return sess


def _route_event(evt: dict, transcript_cbs, audio_cbs, vad_cbs):
    et = evt.get("type", "")
    if "transcription" in et or et == "conversation.item.created":
        return transcript_cbs
    if et.startswith("response.audio"):
        return audio_cbs
    if "speech_" in et:
        return vad_cbs
    return []


class RealtimeSession:
    """Sync realtime session: background receiver thread + callbacks."""

    def __init__(self, client: OpenSpeechClient, model: str = ""):
        self.client = client
        self.model = model
        self._ws = None
        self._receiver: threading.Thread | None = None
        self._running = False
        self._transcript_callbacks: list[Callable[[dict], None]] = []
        self._audio_callbacks: list[Callable[[dict], None]] = []
        self._vad_callbacks: list[Callable[[dict], None]] = []
        self._connect()

    def _connect(self) -> None:
        from websockets.sync.client import connect

        suffix = (
            f"/v1/realtime?{urlencode({'model': self.model})}"
            if self.model
            else "/v1/realtime"
        )
        headers = self.client._headers() or None
        self._ws = connect(
            self.client._ws_url(suffix),
            subprotocols=["realtime"],
            additional_headers=headers,
        )
        self._running = True
        self._receiver = threading.Thread(target=self._recv_loop, daemon=True)
        self._receiver.start()

    def _recv_loop(self) -> None:
        while self._running and self._ws is not None:
            try:
                raw = self._ws.recv()
            except Exception:  # noqa: BLE001 - socket closed/dropped
                break
            if isinstance(raw, bytes):
                continue
            try:
                evt = json.loads(raw)
            except ValueError:
                logger.warning("realtime: dropping malformed frame")
                continue
            for cb in _route_event(
                evt,
                self._transcript_callbacks,
                self._audio_callbacks,
                self._vad_callbacks,
            ):
                # a broken user callback must not kill event dispatch
                # for the rest of the session
                try:
                    cb(evt)
                except Exception:  # noqa: BLE001
                    logger.exception("realtime callback raised")

    def _send(self, payload: dict) -> None:
        if self._ws is None:
            raise RuntimeError("Realtime session is closed")
        self._ws.send(json.dumps(payload))

    def send_audio(self, chunk: bytes) -> None:
        self._send(
            {
                "type": "input_audio_buffer.append",
                "audio": base64.b64encode(chunk).decode("ascii"),
            }
        )

    def commit(self) -> None:
        self._send({"type": "input_audio_buffer.commit"})

    def create_response(self, text: str, voice: str = "alloy") -> None:
        self._send(
            {
                "type": "response.create",
                "response": {
                    "instructions": text,
                    "voice": voice,
                    "modalities": ["audio", "text"],
                },
            }
        )

    def on_transcript(self, callback: Callable[[dict], None]) -> None:
        self._transcript_callbacks.append(callback)

    def on_audio(self, callback: Callable[[dict], None]) -> None:
        self._audio_callbacks.append(callback)

    def on_vad(self, callback: Callable[[dict], None]) -> None:
        self._vad_callbacks.append(callback)

    def close(self) -> None:
        self._running = False
        if self._ws is not None:
            try:
                self._ws.close()
            finally:
                self._ws = None
        if self._receiver is not None:
            self._receiver.join(timeout=1.0)


class AsyncRealtimeSession:
    """Async realtime session: receiver task + (a)sync callbacks."""

    def __init__(self, client: OpenSpeechClient, model: str = ""):
        self.client = client
        self.model = model
        self._ws = None
        self._receiver_task: asyncio.Task | None = None
        self._transcript_callbacks: list[Callable[[dict], Any]] = []
        self._audio_callbacks: list[Callable[[dict], Any]] = []
        self._vad_callbacks: list[Callable[[dict], Any]] = []

    async def connect(self) -> None:
        import websockets

        suffix = (
            f"/v1/realtime?{urlencode({'model': self.model})}"
            if self.model
            else "/v1/realtime"
        )
        headers = (
            list(self.client._headers().items()) if self.client._headers() else None
        )
        self._ws = await websockets.connect(
            self.client._ws_url(suffix),
            subprotocols=["realtime"],
            additional_headers=headers,
        )
        self._receiver_task = asyncio.create_task(self._recv_loop())

    async def _recv_loop(self) -> None:
        assert self._ws is not None
        async for raw in self._ws:
            if isinstance(raw, bytes):
                continue
            try:
                evt = json.loads(raw)
            except ValueError:
                logger.warning("realtime: dropping malformed frame")
                continue
            for cb in _route_event(
                evt,
                self._transcript_callbacks,
                self._audio_callbacks,
                self._vad_callbacks,
            ):
                # a broken user callback must not kill the receiver task
                try:
                    ret = cb(evt)
                    if asyncio.iscoroutine(ret):
                        await ret
                except Exception:  # noqa: BLE001
                    logger.exception("realtime callback raised")

    async def _send(self, payload: dict) -> None:
        if self._ws is None:
            raise RuntimeError("Realtime session is closed")
        await self._ws.send(json.dumps(payload))

    async def send_audio(self, chunk: bytes) -> None:
        await self._send(
            {
                "type": "input_audio_buffer.append",
                "audio": base64.b64encode(chunk).decode("ascii"),
            }
        )

    async def commit(self) -> None:
        await self._send({"type": "input_audio_buffer.commit"})

    async def create_response(self, text: str, voice: str = "alloy") -> None:
        await self._send(
            {
                "type": "response.create",
                "response": {
                    "instructions": text,
                    "voice": voice,
                    "modalities": ["audio", "text"],
                },
            }
        )

    def on_transcript(self, callback: Callable[[dict], Any]) -> None:
        self._transcript_callbacks.append(callback)

    def on_audio(self, callback: Callable[[dict], Any]) -> None:
        self._audio_callbacks.append(callback)

    def on_vad(self, callback: Callable[[dict], Any]) -> None:
        self._vad_callbacks.append(callback)

    async def close(self) -> None:
        if self._receiver_task:
            self._receiver_task.cancel()
            with contextlib.suppress(BaseException):
                await self._receiver_task
        if self._ws is not None:
            await self._ws.close()
            self._ws = None
