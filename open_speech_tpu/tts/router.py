"""TTS router (reference: src/tts/router.py).

Same behaviors: pkgutil auto-discovery of backend classes by duck-typing
(:20-45), ``is_available`` gating (:60-67), prefix routing ``piper/...``
(:96-108), ``register_backend`` plugin hook (:80), ``single_speaker``
voice=model-id passthrough (:156-160), RLock around load/unload (:119-135),
voice aggregation (:162).
"""

from __future__ import annotations

import copy
import importlib
import inspect
import logging
import pkgutil
import threading
from typing import Any, Iterator

import numpy as np

from open_speech_tpu.tts.backends.base import (
    TTSBackend,
    TTSLoadedModelInfo,
    VoiceInfo,
)

logger = logging.getLogger(__name__)


def _discover_backends() -> dict[str, type]:
    discovered: dict[str, type] = {}
    try:
        import open_speech_tpu.tts.backends as backends_pkg

        for _imp, modname, _ispkg in pkgutil.iter_modules(backends_pkg.__path__):
            if modname.startswith("_") or modname == "base":
                continue
            try:
                module = importlib.import_module(
                    f"open_speech_tpu.tts.backends.{modname}"
                )
                for _name, obj in inspect.getmembers(module, inspect.isclass):
                    if (
                        obj is not TTSBackend
                        and hasattr(obj, "name")
                        and hasattr(obj, "sample_rate")
                        and hasattr(obj, "synthesize")
                        and hasattr(obj, "load_model")
                        and obj.__module__ == module.__name__
                    ):
                        discovered[obj.name] = obj
            except Exception as e:  # noqa: BLE001
                logger.warning("Failed to import TTS backend module %s: %s", modname, e)
    except Exception as e:  # noqa: BLE001
        logger.warning("Backend auto-discovery failed: %s", e)
    return discovered


class TTSRouter:
    def __init__(self, device: str = "auto") -> None:
        self._backends: dict[str, TTSBackend] = {}
        self._device = device
        self._default_backend: TTSBackend | None = None
        self._lock = threading.RLock()

        for name, cls in _discover_backends().items():
            try:
                is_available = getattr(cls, "is_available", None)
                if callable(is_available) and not cls.is_available():
                    logger.info("Skipping TTS backend %s — unavailable", name)
                    continue
                self._backends[name] = cls(device=device)
                logger.info("Auto-registered TTS backend: %s", name)
            except Exception as e:  # noqa: BLE001
                logger.warning("Failed to instantiate backend %s: %s", name, e)

        if "kokoro" in self._backends:
            self._default_backend = self._backends["kokoro"]
        elif self._backends:
            self._default_backend = next(iter(self._backends.values()))

    def register_backend(self, name: str, backend: TTSBackend) -> None:
        lock = getattr(self, "_lock", None) or threading.RLock()
        self._lock = lock
        with lock:
            self._backends[name] = backend
            logger.info("Registered TTS backend: %s", name)
            if self._default_backend is None:
                self._default_backend = backend

    def get_backend(self, model_id: str) -> TTSBackend:
        if model_id in self._backends:
            return self._backends[model_id]
        prefix = model_id.split("/")[0] if "/" in model_id else None
        if prefix and prefix in self._backends:
            return self._backends[prefix]
        if self._default_backend is not None:
            return self._default_backend
        raise RuntimeError("No TTS backends available")

    def list_backends(self) -> list[str]:
        return list(self._backends.keys())

    def get_capabilities(self, model_id: str) -> dict[str, Any]:
        return copy.deepcopy(getattr(self.get_backend(model_id), "capabilities", {}))

    def load_model(self, model_id: str) -> None:
        with self._lock:
            self.get_backend(model_id).load_model(model_id)

    def unload_model(self, model_id: str) -> None:
        with self._lock:
            self.get_backend(model_id).unload_model(model_id)

    def is_model_loaded(self, model_id: str) -> bool:
        return self.get_backend(model_id).is_model_loaded(model_id)

    def loaded_models(self) -> list[TTSLoadedModelInfo]:
        result = []
        for backend in self._backends.values():
            result.extend(backend.loaded_models())
        return result

    def synthesize(
        self,
        text: str,
        model: str,
        voice: str,
        speed: float = 1.0,
        lang_code: str | None = None,
    ) -> Iterator[np.ndarray]:
        backend = self.get_backend(model)
        effective_voice = (
            model if getattr(backend, "single_speaker", False) else voice
        )
        return backend.synthesize(text, effective_voice, speed, lang_code)

    def list_voices(self, model: str | None = None) -> list[VoiceInfo]:
        if model and model in self._backends:
            return self._backends[model].list_voices()
        voices = []
        for backend in self._backends.values():
            voices.extend(backend.list_voices())
        return voices
