"""Pure units: voice library, TTS cache, error envelope.

(reference: tests/test_voice_library.py, tests/test_tts_cache.py shapes —
written fresh against our implementations.)
"""

import time

import numpy as np
import pytest

from open_speech_tpu.cache.tts_cache import TTSCache
from open_speech_tpu.ops.audio import write_wav
from open_speech_tpu.studio.voice_library import (
    VoiceLibraryManager,
    VoiceNotFoundError,
    _slug,
)


def _wav_bytes():
    return write_wav(np.zeros(1600, np.float32), 16000)


# ── voice library ────────────────────────────────────────────────────


def test_slug_sanitization():
    assert _slug("My Voice!") == _slug("my voice")
    assert "/" not in _slug("../../etc/passwd")
    assert ".." not in _slug("../../etc/passwd")


def test_save_get_delete_cycle(tmp_path):
    lib = VoiceLibraryManager(tmp_path)
    meta = lib.save("Test Voice", _wav_bytes(), content_type="audio/wav")
    assert meta["name"] == _slug("Test Voice")
    listed = lib.list_voices()
    assert any(v["name"] == _slug("Test Voice") for v in listed)
    audio, meta2 = lib.get("Test Voice")
    assert audio[:4] == b"RIFF"
    assert meta2["size_bytes"] == len(_wav_bytes())
    lib.delete("Test Voice")
    with pytest.raises(VoiceNotFoundError):
        lib.get("Test Voice")


def test_non_wav_rejected(tmp_path):
    lib = VoiceLibraryManager(tmp_path)
    with pytest.raises(ValueError):
        lib.save("bad", b"definitely not a wav file", content_type="audio/wav")


def test_max_count_enforced(tmp_path):
    lib = VoiceLibraryManager(tmp_path, max_count=2)
    lib.save("one", _wav_bytes())
    lib.save("two", _wav_bytes())
    with pytest.raises(ValueError):
        lib.save("three", _wav_bytes())


# ── TTS cache ────────────────────────────────────────────────────────


def test_cache_key_stability_and_distinctness(tmp_path):
    c = TTSCache(str(tmp_path))
    k1 = c.make_key("hi", "af", 1.0, "wav", "kokoro")
    k2 = c.make_key("hi", "af", 1.0, "wav", "kokoro")
    k3 = c.make_key("hi!", "af", 1.0, "wav", "kokoro")
    assert k1 == k2 != k3


def test_cache_roundtrip_and_miss(tmp_path):
    c = TTSCache(str(tmp_path))
    assert c.get_for(text="a", voice="v", speed=1.0, fmt="wav", model="m") is None
    c.set_for(text="a", voice="v", speed=1.0, fmt="wav", model="m", audio=b"DATA")
    assert c.get_for(text="a", voice="v", speed=1.0, fmt="wav", model="m") == b"DATA"


def test_cache_disabled_is_noop(tmp_path):
    c = TTSCache(str(tmp_path), enabled=False)
    c.set_for(text="a", voice="v", speed=1.0, fmt="wav", model="m", audio=b"DATA")
    assert c.get_for(text="a", voice="v", speed=1.0, fmt="wav", model="m") is None


def test_cache_eviction_by_size(tmp_path):
    c = TTSCache(str(tmp_path), max_mb=1)
    big = b"x" * (600 * 1024)
    c.set_for(text="a", voice="v", speed=1.0, fmt="wav", model="m", audio=big)
    time.sleep(0.01)
    c.set_for(text="b", voice="v", speed=1.0, fmt="wav", model="m", audio=big)
    c.cleanup()
    kept = [
        c.get_for(text=t, voice="v", speed=1.0, fmt="wav", model="m") is not None
        for t in ("a", "b")
    ]
    assert kept.count(True) == 1  # oldest evicted to fit under max_mb
    assert kept[1]  # the newer entry survives


# ── error envelope ───────────────────────────────────────────────────


def test_api_error_envelope_shape():
    import asyncio
    import json

    from aiohttp.test_utils import make_mocked_request

    from open_speech_tpu.server.errors import ApiError, error_middleware

    async def boom(request):
        raise ApiError(418, "teapot", "teapot_code")

    req = make_mocked_request("GET", "/x")
    resp = asyncio.new_event_loop().run_until_complete(error_middleware(req, boom))
    assert resp.status == 418
    body = json.loads(resp.text)
    assert body["error"]["message"] == "teapot"
    assert body["error"]["code"] == "teapot_code"


def test_unexpected_error_becomes_500():
    import asyncio
    import json

    from aiohttp.test_utils import make_mocked_request

    from open_speech_tpu.server.errors import error_middleware

    async def boom(request):
        raise RuntimeError("internal detail that should not leak stack")

    req = make_mocked_request("GET", "/x")
    resp = asyncio.new_event_loop().run_until_complete(error_middleware(req, boom))
    assert resp.status == 500
    body = json.loads(resp.text)
    assert "error" in body


def test_tts_cache_key_fields_cannot_collide():
    # '|' inside one field must not alias another (text, voice) pair
    a = TTSCache.make_key("hello|af_sky", "af_bella", 1.0, "wav", "kokoro")
    b = TTSCache.make_key("hello", "af_sky|af_bella", 1.0, "wav", "kokoro")
    assert a != b


def test_tts_cache_disabled_dir_safe(tmp_path):
    # mkdir failed (parent is a file): degrade to disabled, never crash
    parent = tmp_path / "afile"
    parent.write_text("x")
    c = TTSCache(str(parent / "cache"))
    assert not c.enabled
    assert c.cleanup() == 0
    assert c.stats()["entries"] == 0
    assert c.get_for(text="a", voice="b", speed=1.0, fmt="wav", model="m") is None


def test_tts_cache_atomic_set_no_tmp_left(tmp_path):
    c = TTSCache(str(tmp_path))
    k = c.make_key("hi", "af", 1.0, "wav", "kokoro")
    c.set(k, "wav", b"data")
    assert c.get(k, "wav") == b"data"
    assert not list(tmp_path.glob("*.tmp"))
