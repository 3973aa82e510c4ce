"""STT backend router.

Same responsibilities as the reference's BackendRouter (src/router.py):
resolve a model id to a backend, fan listing calls across registered
backends, pass inference through. One JAX whisper backend serves everything
today; it is registered under both its native name and the reference's
``faster-whisper`` provider name so old configs resolve.
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
        self._lock = asyncio.Lock()
        whisper = JaxWhisperBackend()
        # both provider names resolve to the same backend instance
        self._backends: dict[str, STTBackend] = {
            "jax-whisper": whisper,
            "faster-whisper": whisper,
        }
        self._default_backend: STTBackend = whisper

    def get_backend(self, model_id: str) -> STTBackend:
        return self._default_backend

    def _unique_backends(self):
        seen: set[int] = set()
        for backend in self._backends.values():
            if id(backend) not in seen:
                seen.add(id(backend))
                yield backend

    # ── lifecycle passthrough ─────────────────────────────────────────

    def load_model(self, model_id: str) -> None:
        self.get_backend(model_id).load_model(model_id)

    def unload_model(self, model_id: str) -> None:
        self.get_backend(model_id).unload_model(model_id)

    def is_model_loaded(self, model_id: str) -> bool:
        return self.get_backend(model_id).is_model_loaded(model_id)

    def loaded_models(self) -> list[LoadedModelInfo]:
        out: list[LoadedModelInfo] = []
        for backend in self._unique_backends():
            out.extend(backend.loaded_models())
        return out

    # ── cache passthrough (duck-typed, like the reference) ────────────

    def list_cached_models(self) -> list[dict[str, Any]]:
        out: list[dict[str, Any]] = []
        for backend in self._unique_backends():
            lister = getattr(backend, "list_cached_models", None)
            if callable(lister):
                out.extend(lister())
        return out

    def delete_cached_model(self, model_id: str) -> bool:
        deleter = getattr(self.get_backend(model_id), "delete_cached_model", None)
        return bool(deleter(model_id)) if callable(deleter) else False

    def is_model_cached(self, model_id: str) -> bool:
        checker = getattr(self.get_backend(model_id), "is_model_cached", None)
        return bool(checker(model_id)) if callable(checker) else False

    # ── inference passthrough ─────────────────────────────────────────

    def transcribe(self, audio: bytes, model: str, **kwargs: Any) -> dict[str, Any]:
        return self.get_backend(model).transcribe(audio, model, **kwargs)

    def translate(self, audio: bytes, model: str, **kwargs: Any) -> dict[str, Any]:
        return self.get_backend(model).translate(audio, model, **kwargs)


router = BackendRouter()
