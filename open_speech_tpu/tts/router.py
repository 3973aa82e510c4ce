"""TTS router: model-id -> backend resolution with auto-discovery.

Reference behaviors preserved (src/tts/router.py): backends are discovered
by duck-typing the modules in the backends package, unavailable ones are
skipped via ``is_available``, ``piper/...`` prefixes route to the piper
backend, plugins can ``register_backend``, load/unload run under an RLock,
single-speaker backends receive the model id as the voice selector, and
voice listings aggregate across backends.
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

_BACKEND_ATTRS = ("name", "sample_rate", "synthesize", "load_model")


def _looks_like_backend(obj, module_name: str) -> bool:
    return (
        inspect.isclass(obj)
        and obj is not TTSBackend
        and obj.__module__ == module_name
        and all(hasattr(obj, attr) for attr in _BACKEND_ATTRS)
    )


def _discover_backends() -> dict[str, type]:
    found: dict[str, type] = {}
    import open_speech_tpu.tts.backends as pkg

    for _importer, module_name, _is_pkg in pkgutil.iter_modules(pkg.__path__):
        if module_name == "base" or module_name.startswith("_"):
            continue
        qualified = f"open_speech_tpu.tts.backends.{module_name}"
        try:
            module = importlib.import_module(qualified)
        except Exception as exc:  # noqa: BLE001
            logger.warning("Failed to import TTS backend module %s: %s",
                           module_name, exc)
            continue
        for _name, cls in inspect.getmembers(module, inspect.isclass):
            if _looks_like_backend(cls, qualified):
                found[cls.name] = cls
    return found


class TTSRouter:
    def __init__(self, device: str = "auto") -> None:
        self._device = device
        self._lock = threading.RLock()
        self._backends: dict[str, TTSBackend] = {}
        self._default_backend: TTSBackend | None = None
        self._instantiate_discovered()

    def _instantiate_discovered(self) -> None:
        for name, cls in _discover_backends().items():
            gate = getattr(cls, "is_available", None)
            if callable(gate) and not cls.is_available():
                logger.info("Skipping TTS backend %s — unavailable", name)
                continue
            try:
                self._backends[name] = cls(device=self._device)
                logger.info("Auto-registered TTS backend: %s", name)
            except Exception as exc:  # noqa: BLE001
                logger.warning("Failed to instantiate backend %s: %s", name, exc)
        self._default_backend = self._backends.get("kokoro") or next(
            iter(self._backends.values()), None
        )

    # ── registration / resolution ─────────────────────────────────────

    def register_backend(self, name: str, backend: TTSBackend) -> None:
        """Plugin hook: add a backend at runtime."""
        with self._lock:
            self._backends[name] = backend
            logger.info("Registered TTS backend: %s", name)
            if self._default_backend is None:
                self._default_backend = backend

    def get_backend(self, model_id: str) -> TTSBackend:
        backend = self._backends.get(model_id)
        if backend is None and "/" in model_id:
            backend = self._backends.get(model_id.split("/", 1)[0])
        if backend is None:
            backend = self._default_backend
        if backend is None:
            raise RuntimeError("No TTS backends available")
        return backend

    def list_backends(self) -> list[str]:
        return list(self._backends)

    def get_capabilities(self, model_id: str) -> dict[str, Any]:
        caps = getattr(self.get_backend(model_id), "capabilities", {})
        return copy.deepcopy(caps)

    # ── lifecycle ─────────────────────────────────────────────────────

    def load_model(self, model_id: str) -> None:
        with self._lock:
            self.get_backend(model_id).load_model(model_id)

    def unload_model(self, model_id: str) -> None:
        with self._lock:
            self.get_backend(model_id).unload_model(model_id)

    def is_model_loaded(self, model_id: str) -> bool:
        return self.get_backend(model_id).is_model_loaded(model_id)

    def loaded_models(self) -> list[TTSLoadedModelInfo]:
        out: list[TTSLoadedModelInfo] = []
        for backend in self._backends.values():
            out.extend(backend.loaded_models())
        return out

    # ── synthesis / voices ────────────────────────────────────────────

    def synthesize(
        self,
        text: str,
        model: str,
        voice: str,
        speed: float = 1.0,
        lang_code: str | None = None,
    ) -> Iterator[np.ndarray]:
        backend = self.get_backend(model)
        if getattr(backend, "single_speaker", False):
            # single-speaker backends select by model id (piper semantics)
            voice = model
        return backend.synthesize(text, voice, speed, lang_code)

    def list_voices(self, model: str | None = None) -> list[VoiceInfo]:
        if model and model in self._backends:
            return self._backends[model].list_voices()
        merged: list[VoiceInfo] = []
        for backend in self._backends.values():
            merged.extend(backend.list_voices())
        return merged
