"""STT backend router (reference: src/router.py).

Same surface: prefix-based backend resolution (single jax-whisper backend
today), aggregated loaded/cached listings, module-level singleton. The
``_lock`` is used by callers (lifecycle daemon) exactly as in the reference.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any

from open_speech_tpu.backends.base import STTBackend
from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
from open_speech_tpu.schemas import LoadedModelInfo

logger = logging.getLogger(__name__)


class BackendRouter:
    def __init__(self) -> None:
        self._backends: dict[str, STTBackend] = {}
        self._lock = asyncio.Lock()
        jw = JaxWhisperBackend()
        self._backends["jax-whisper"] = jw
        # reference configs name this provider; same backend serves it
        self._backends["faster-whisper"] = jw
        self._default_backend = jw

    def get_backend(self, model_id: str) -> STTBackend:
        return self._default_backend

    def load_model(self, model_id: str) -> None:
        self.get_backend(model_id).load_model(model_id)

    def unload_model(self, model_id: str) -> None:
        self.get_backend(model_id).unload_model(model_id)

    def loaded_models(self) -> list[LoadedModelInfo]:
        result = []
        seen = set()
        for backend in self._backends.values():
            if id(backend) in seen:
                continue
            seen.add(id(backend))
            result.extend(backend.loaded_models())
        return result

    def is_model_loaded(self, model_id: str) -> bool:
        return self.get_backend(model_id).is_model_loaded(model_id)

    def list_cached_models(self) -> list[dict[str, Any]]:
        result = []
        seen = set()
        for backend in self._backends.values():
            if id(backend) in seen:
                continue
            seen.add(id(backend))
            if hasattr(backend, "list_cached_models"):
                result.extend(backend.list_cached_models())
        return result

    def delete_cached_model(self, model_id: str) -> bool:
        backend = self.get_backend(model_id)
        if hasattr(backend, "delete_cached_model"):
            return backend.delete_cached_model(model_id)
        return False

    def is_model_cached(self, model_id: str) -> bool:
        backend = self.get_backend(model_id)
        if hasattr(backend, "is_model_cached"):
            return backend.is_model_cached(model_id)
        return False

    def transcribe(self, audio: bytes, model: str, **kwargs: Any) -> dict[str, Any]:
        return self.get_backend(model).transcribe(audio, model, **kwargs)

    def translate(self, audio: bytes, model: str, **kwargs: Any) -> dict[str, Any]:
        return self.get_backend(model).translate(audio, model, **kwargs)


router = BackendRouter()
