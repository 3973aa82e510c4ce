"""Runtime layer: router, model manager state machine, lifecycle, registry.

Mirrors the reference's fake-backend strategy (tests/test_model_manager.py).
"""

import asyncio
import threading
import time

import pytest

from open_speech_tpu.config import settings
from open_speech_tpu.runtime.model_manager import (
    ModelLifecycleError,
    ModelManager,
    ModelState,
)
from open_speech_tpu.runtime.registry import get_known_model, get_known_models
from open_speech_tpu.schemas import LoadedModelInfo
from open_speech_tpu.tts.backends.base import TTSLoadedModelInfo


class FakeSTTBackend:
    name = "jax-whisper"

    def __init__(self):
        self._models = {}
        self._last_used = {}

    def load_model(self, model_id):
        self._models[model_id] = object()
        self._last_used[model_id] = time.time()

    def unload_model(self, model_id):
        self._models.pop(model_id, None)
        self._last_used.pop(model_id, None)

    def loaded_models(self):
        return [
            LoadedModelInfo(
                model=m, backend=self.name, device="tpu", compute_type="bf16",
                loaded_at=0.0, last_used_at=self._last_used.get(m),
            )
            for m in self._models
        ]

    def is_model_loaded(self, model_id):
        return model_id in self._models

    def list_cached_models(self):
        return []

    def transcribe(self, audio, model, **kw):
        return {"text": "hello world"}

    def translate(self, audio, model, **kw):
        return {"text": "hello world"}


class FakeSTTRouter:
    def __init__(self):
        self._default_backend = FakeSTTBackend()
        self._backends = {"jax-whisper": self._default_backend}
        self._lock = asyncio.Lock()

    def __getattr__(self, item):
        return getattr(self._default_backend, item)


class FakeTTSBackend:
    name = "kokoro"

    def __init__(self):
        self._loaded = set()
        self._last_used = {}

    def load_model(self, model_id):
        self._loaded.add(model_id)
        self._last_used[model_id] = time.time()

    def unload_model(self, model_id):
        self._loaded.discard(model_id)
        self._last_used.pop(model_id, None)

    def is_model_loaded(self, model_id):
        return model_id in self._loaded

    def loaded_models(self):
        return [
            TTSLoadedModelInfo(
                model=m, backend=self.name, device="tpu", loaded_at=0.0,
                last_used_at=self._last_used.get(m),
            )
            for m in self._loaded
        ]


class FakeTTSRouter:
    def __init__(self):
        self._backends = {"kokoro": FakeTTSBackend(), "piper": FakeTTSBackend()}
        self._kokoro = self._backends["kokoro"]

    def load_model(self, model_id):
        self._kokoro.load_model(model_id)

    def unload_model(self, model_id):
        self._kokoro.unload_model(model_id)

    def is_model_loaded(self, model_id):
        return self._kokoro.is_model_loaded(model_id)

    def loaded_models(self):
        return self._kokoro.loaded_models()


@pytest.fixture
def manager():
    return ModelManager(FakeSTTRouter(), FakeTTSRouter())


def test_registry_contains_core_models():
    ids = {m["id"] for m in get_known_models()}
    assert "whisper-large-v3-turbo" in ids
    assert "deepdml/faster-whisper-large-v3-turbo-ct2" in ids  # reference alias
    assert "kokoro" in ids
    assert "piper/en_US-lessac-medium" in ids
    assert get_known_model("whisper-tiny")["type"] == "stt"
    assert get_known_model("nonexistent") is None


def test_load_and_status(manager):
    info = manager.load("whisper-tiny")
    assert info.state == ModelState.LOADED
    assert info.type == "stt"
    assert manager.status("whisper-tiny").state == ModelState.LOADED


def test_load_evicts_same_type(manager):
    manager.load("whisper-tiny")
    manager.load("whisper-base")
    loaded = [m.id for m in manager.list_loaded() if m.type == "stt"]
    assert loaded == ["whisper-base"]


def test_load_does_not_evict_other_type(manager):
    manager.load("whisper-tiny")
    manager.load("kokoro")
    types = {m.type for m in manager.list_loaded()}
    assert types == {"stt", "tts"}


def test_download_loads_then_unloads(manager):
    info = manager.download("whisper-tiny")
    assert not manager._stt.is_model_loaded("whisper-tiny")
    assert info.id == "whisper-tiny"


def test_resolve_type_tts_prefixes(manager):
    assert manager._resolve_type("kokoro") == "tts"
    assert manager._resolve_type("piper/en_US-amy-medium") == "tts"
    assert manager._resolve_type("whisper-tiny") == "stt"


def test_provider_resolution(manager):
    assert manager.resolve_provider("kokoro") == "kokoro"
    assert manager.resolve_provider("piper/en_US-amy-medium") == "piper"
    assert manager.resolve_provider("whisper-large-v3") == "jax-whisper"
    assert manager.resolve_provider("arbitrary/unknown-model") == "jax-whisper"


def test_list_all_merges_catalog(manager):
    manager.load("whisper-tiny")
    all_models = {m.id: m for m in manager.list_all()}
    assert all_models["whisper-tiny"].state == ModelState.LOADED
    assert all_models["kokoro"].state != ModelState.LOADED
    assert len(all_models) >= 40


def test_delete_artifacts_not_found(manager):
    result = manager.delete_artifacts("whisper-tiny")
    assert result["status"] == "not_found"
    assert result["model"] == "whisper-tiny"


def test_ttl_eviction(manager, monkeypatch):
    manager.load("whisper-tiny")
    backend = manager._stt._default_backend
    backend._last_used["whisper-tiny"] = time.time() - 10_000
    monkeypatch.setattr(settings, "os_model_ttl", 300)
    # default model is exempt
    monkeypatch.setattr(settings, "stt_model", "whisper-large-v3-turbo")
    manager.check_ttl()
    assert not backend.is_model_loaded("whisper-tiny")


def test_ttl_default_exempt(manager, monkeypatch):
    monkeypatch.setattr(settings, "stt_model", "whisper-tiny")
    manager.load("whisper-tiny")
    backend = manager._stt._default_backend
    backend._last_used["whisper-tiny"] = time.time() - 10_000
    manager.check_ttl()
    assert backend.is_model_loaded("whisper-tiny")


def test_evict_lru(manager, monkeypatch):
    monkeypatch.setattr(settings, "stt_model", "whisper-large-v3-turbo")
    manager.load("whisper-tiny")
    manager.load("kokoro")
    backend = manager._stt._default_backend
    backend._last_used["whisper-tiny"] = time.time() - 500
    manager.evict_lru()
    assert not backend.is_model_loaded("whisper-tiny")


def test_lifecycle_error_shape():
    err = ModelLifecycleError(
        message="m", code="load_failed", model_id="x", provider="p", action="load"
    )
    d = err.to_dict()
    assert d["code"] == "load_failed" and d["model"] == "x"


def test_unload_stt_and_tts(manager):
    manager.load("whisper-tiny")
    manager.unload("whisper-tiny")
    assert all(m.id != "whisper-tiny" for m in manager.list_loaded())
    manager.load("kokoro")
    manager.unload("kokoro")
    assert manager.list_loaded() == []


def test_status_not_loaded_tts(manager):
    info = manager.status("pocket-tts")
    assert info.state in (ModelState.AVAILABLE, ModelState.PROVIDER_MISSING)
    assert info.type == "tts"


def test_status_default_flag(manager, monkeypatch):
    monkeypatch.setattr(settings, "stt_model", "whisper-tiny")
    info = manager.status("whisper-tiny")
    assert info.is_default


def test_provider_missing_marked(manager):
    """A TTS model whose provider isn't registered reports provider_missing
    (reference: tests/test_model_manager.py provider-missing cases)."""
    manager._tts._backends.pop("piper", None)
    info = manager.status("piper/en_US-lessac-medium")
    assert info.state == ModelState.PROVIDER_MISSING
    assert info.provider_available is False
    with pytest.raises(ModelLifecycleError):
        manager.load("piper/en_US-lessac-medium")


def test_load_missing_provider_does_not_evict(manager):
    manager.load("kokoro")
    manager._tts._backends.pop("piper", None)
    with pytest.raises(ModelLifecycleError):
        manager.load("piper/en_US-lessac-medium")
    # the already-loaded model survived the failed load
    assert any(m.id == "kokoro" for m in manager.list_loaded())


def test_evict_lru_skips_default(manager, monkeypatch):
    monkeypatch.setattr(settings, "stt_model", "whisper-tiny")
    manager.load("whisper-tiny")
    assert manager.list_loaded()[0].is_default
    manager.evict_lru()  # nothing evictable: only the default is loaded
    assert any(m.id == "whisper-tiny" for m in manager.list_loaded())


def test_model_info_to_dict_shape(manager):
    d = manager.load("whisper-tiny").to_dict()
    for key in ("id", "type", "provider", "state", "is_default"):
        assert key in d
    assert d["state"] == "loaded"


def test_piper_artifact_paths_match_backend_cache(manager, tmp_path, monkeypatch):
    """Artifact deletion must look where the piper backend actually caches
    voices (single .onnx files, not HF snapshot dirs)."""
    monkeypatch.setenv("OS_PIPER_VOICES_DIR", str(tmp_path))
    voice = tmp_path / "en_US-amy-medium.onnx"
    voice.write_bytes(b"onnx")
    (tmp_path / "en_US-amy-medium.onnx.json").write_text("{}")
    paths = manager._candidate_artifact_paths(
        "piper/en_US-amy-medium", "piper"
    )
    assert voice in paths
    result = manager.delete_artifacts("piper/en_US-amy-medium")
    assert result["status"] == "deleted"
    assert not voice.exists()
    assert not (tmp_path / "en_US-amy-medium.onnx.json").exists()


def test_pocket_artifact_paths_cover_kyutai_cache(manager):
    paths = manager._candidate_artifact_paths("pocket-tts", "pocket-tts")
    assert any("models--kyutai--pocket-tts" in str(p) for p in paths)


def test_cached_stt_infos_include_off_catalog(manager):
    """A custom repo id downloaded via the API must list as downloaded even
    though it is not in the curated catalog."""
    manager._stt.list_cached_models = lambda: [
        {"model": "someorg/custom-whisper-ct2", "backend": "jax-whisper"}
    ]
    infos = manager._cached_stt_infos({"kokoro": "tts"})
    assert any(i.id == "someorg/custom-whisper-ct2" for i in infos)
    assert all(i.state == ModelState.DOWNLOADED for i in infos)


# ── lifecycle daemon victim re-check + stale batcher retirement ───────


def test_lifecycle_recheck_spares_bumped_model(manager, monkeypatch):
    """A model whose _last_used was bumped between victim selection and
    unload must survive the sweep (selection runs outside any lock)."""
    from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager

    monkeypatch.setattr(settings, "os_model_ttl", 300)
    monkeypatch.setattr(settings, "stt_model", "whisper-large-v3-turbo")
    router = manager._stt
    backend = router._default_backend
    backend.load_model("whisper-tiny")
    backend._last_used["whisper-tiny"] = time.time() - 10_000
    lm = ModelLifecycleManager(router)

    victims = lm._idle_victims(backend, time.time())
    assert victims == ["whisper-tiny"]
    # request arrives after selection: bump before the locked unload
    backend._last_used["whisper-tiny"] = time.time()
    asyncio.run(lm._unload_if_still_victim(backend, "whisper-tiny", "TTL"))
    assert backend.is_model_loaded("whisper-tiny")
    # idle again: the recheck lets the unload through
    backend._last_used["whisper-tiny"] = time.time() - 10_000
    asyncio.run(lm._unload_if_still_victim(backend, "whisper-tiny", "TTL"))
    assert not backend.is_model_loaded("whisper-tiny")


def test_lifecycle_sweep_evicts_idle_tts_via_manager(manager, monkeypatch):
    from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager

    monkeypatch.setattr(settings, "os_model_ttl", 300)
    monkeypatch.setattr(settings, "tts_model", "pocket-tts")
    manager.load("kokoro")
    tts_backend = manager._tts._backends["kokoro"]
    tts_backend._last_used["kokoro"] = time.time() - 10_000
    lm = ModelLifecycleManager(manager._stt, manager=manager)
    asyncio.run(lm._sweep())
    assert not tts_backend.is_model_loaded("kokoro")


def test_batcher_pool_is_current_uses_source_params(manager):
    """ContinuousBatcher may re-shard params into a new pytree; staleness
    must compare against the SOURCE params or every call churns a new
    multi-GB KV pool (review fix)."""
    from open_speech_tpu.runtime import batcher_pool

    params = {"w": 1}
    backend = FakeSTTBackend()
    backend._models["m"] = {"params": params}

    class FakeBatcher:
        def __init__(self):
            self.params = {"w": 1}  # re-sharded: a DIFFERENT pytree
            self._source_params = params

    b = FakeBatcher()
    assert batcher_pool._is_current(b, backend, "m")
    backend._models["m"] = {"params": {"w": 2}}  # model reloaded
    assert not batcher_pool._is_current(b, backend, "m")


def test_batcher_pool_retire_stale(manager):
    from open_speech_tpu.runtime import batcher_pool

    params = {"w": 1}
    backend = FakeSTTBackend()
    backend._models["m"] = {"params": params}

    stopped = []

    class FakeBatcher:
        occupancy = 0

        class _Q:
            @staticmethod
            def empty():
                return True

        _queue = _Q()

        async def stop(self):
            stopped.append(self)

    FakeBatcher.params = params
    FakeBatcher._source_params = params

    async def _run():
        live = FakeBatcher()
        batcher_pool._batchers[("m", "en", "transcribe")] = live
        # current: nothing retired
        assert await batcher_pool.retire_stale(backend) == 0
        # model evicted: batcher must be retired
        backend._models.pop("m")
        assert await batcher_pool.retire_stale(backend) == 1
        assert not batcher_pool._batchers
        await asyncio.sleep(0.3)  # let the _retire task drain + stop
        assert stopped

    try:
        asyncio.run(_run())
    finally:
        batcher_pool.reset_pool()
