"""StreamingSession on the O(n) incremental path (VERDICT item 4).

Uses the real JAX whisper backend at test-tiny size through the session's
own plumbing: interim transcriptions must ride the incremental encoder
(no per-chunk full transcribe), each mel frame encoded once; window-sized finals reuse the incremental
states (fresh full-budget decode); longer finals take the exact path; mock/scripted backends
must make the session fall back without errors.
"""

import asyncio
from unittest.mock import MagicMock

import numpy as np
import pytest

from open_speech_tpu.runtime.router import router as backend_router
from open_speech_tpu.server.streaming import StreamingSession


class _WS:
    def __init__(self):
        self.sent: list[str] = []

    async def send_str(self, s):
        self.sent.append(s)


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        coro
    )


@pytest.fixture()
def tiny_backend():
    """Real jax-whisper backend entry at test-tiny size."""
    import jax
    import jax.numpy as jnp

    from open_speech_tpu.models.whisper.model import PRESETS, init_params
    from open_speech_tpu.models.whisper.tokenizer import get_tokenizer

    cfg = PRESETS["test-tiny"]
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tok = get_tokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    entry = {"params": params, "cfg": cfg, "tok": tok}

    backend = MagicMock()
    backend.name = "jax-whisper"
    backend._ensure_model = lambda _m: entry
    backend.transcribe.return_value = {"text": "final text"}

    original = backend_router._default_backend
    backend_router._default_backend = backend
    for key in list(backend_router._backends):
        backend_router._backends[key] = backend
    yield backend
    backend_router._default_backend = original
    for key in list(backend_router._backends):
        backend_router._backends[key] = original


def _session(**kw):
    return StreamingSession(
        ws=_WS(), model="test-tiny", language="en", sample_rate=16000,
        interim_results=True, endpointing_ms=300, vad_enabled=False, **kw,
    )


def test_interims_use_incremental_encoder(tiny_backend, monkeypatch):
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_stream_incremental",
        True,
    )
    session = _session()
    rng = np.random.default_rng(0)

    async def body():
        for _ in range(6):  # 6 x 100ms chunks
            pcm = (rng.uniform(-0.4, 0.4, 1600) * 32767).astype(np.int16)
            session.utterance_audio.extend(pcm.tobytes())
            await session._run_transcription()

    _run(body())
    # interims never hit the backend's full transcribe
    tiny_backend.transcribe.assert_not_called()
    enc = session._inc_encoder
    assert enc is not None
    assert enc.total_positions == 30  # 0.6 s = 30 encoder positions fed
    # O(n): committed blocks bounded by positions/block, not by chunk count
    assert enc.block_encodes <= enc.total_positions // enc.block_pos


def test_final_within_window_reuses_incremental_states(tiny_backend, monkeypatch):
    """A window-sized final decodes fresh over the ALREADY-encoded
    incremental states (one dispatch) instead of re-transcribing the
    whole utterance from raw PCM — the O(n) property extended to
    finals."""
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_stream_incremental",
        True,
    )
    session = _session()
    pcm = (np.zeros(16000)).astype(np.int16)  # 1.0 s < 1.2 s window
    session.utterance_audio.extend(pcm.tobytes())

    result = _run(session._run_transcription(final=True))
    assert result is not None
    tiny_backend.transcribe.assert_not_called()


def test_final_beyond_window_takes_exact_full_path(tiny_backend, monkeypatch):
    """Utterances longer than the model window overflow the incremental
    encoder; their finals must take the exact multi-window path."""
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_stream_incremental",
        True,
    )
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_batcher_enabled",
        False,
    )
    session = _session()
    pcm = (np.zeros(3 * 16000)).astype(np.int16)  # 3 s > 1.2 s window
    session.utterance_audio.extend(pcm.tobytes())

    _run(session._run_transcription(final=True))
    tiny_backend.transcribe.assert_called_once()


def test_incremental_resets_per_utterance(tiny_backend, monkeypatch):
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_stream_incremental",
        True,
    )
    session = _session()
    rng = np.random.default_rng(1)

    async def body():
        pcm = (rng.uniform(-0.4, 0.4, 16000) * 32767).astype(np.int16)
        session.utterance_audio.extend(pcm.tobytes())
        await session._run_transcription()
        assert session._inc_fed > 0
        await session._finalize_utterance()

    _run(body())
    assert session._inc_fed == 0
    assert session._inc_encoder.total_positions == 0


def test_mock_backend_falls_back_cleanly(monkeypatch):
    """Backends without the JAX entry shape (plugins, test fakes) must not
    error: the session probes once, then uses the executor path."""
    monkeypatch.setattr(
        "open_speech_tpu.server.streaming.settings.os_stream_incremental",
        True,
    )
    mock = MagicMock()
    mock.name = "scripted"
    mock.transcribe.return_value = {"text": "hello"}
    original = backend_router._default_backend
    backend_router._default_backend = mock
    for key in list(backend_router._backends):
        backend_router._backends[key] = mock
    try:
        session = _session()
        session.utterance_audio.extend(b"\x00\x00" * 16000)
        result = _run(session._run_transcription())
        assert result == {"text": "hello"}
        assert session._inc_broken is True
        mock.transcribe.assert_called_once()
    finally:
        backend_router._default_backend = original
        for key in list(backend_router._backends):
            backend_router._backends[key] = original
