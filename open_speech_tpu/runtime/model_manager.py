"""Unified model manager (reference: src/model_manager.py).

Same state machine (available/provider_missing/provider_installed/
downloading/downloaded/loaded), typed ``ModelLifecycleError``, auto-evict of
other same-type models on load, download-as-load+unload, guarded artifact
deletion, merged catalog listing, and TTL/LRU eviction entry points.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import Any

from open_speech_tpu.config import settings
from open_speech_tpu.runtime.registry import get_known_model, get_known_models

logger = logging.getLogger(__name__)

_TTS_PREFIXES = ("kokoro", "piper/", "piper-", "pocket-tts")


def _check_provider(model_type: str, provider: str, stt_router, tts_router) -> bool:
    if model_type == "tts":
        return provider in getattr(tts_router, "_backends", {})
    stt_backends = getattr(stt_router, "_backends", None)
    if not stt_backends:
        return True
    return provider in stt_backends


class ModelState(str, Enum):
    AVAILABLE = "available"
    PROVIDER_MISSING = "provider_missing"
    PROVIDER_INSTALLED = "provider_installed"
    DOWNLOADING = "downloading"
    DOWNLOADED = "downloaded"
    LOADED = "loaded"


@dataclass
class ModelLifecycleError(Exception):
    message: str
    code: str
    model_id: str
    provider: str | None = None
    action: str | None = None
    details: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        payload = {
            "message": self.message,
            "code": self.code,
            "model": self.model_id,
            "provider": self.provider,
            "action": self.action,
        }
        if self.details:
            payload["details"] = self.details
        return payload


@dataclass
class ModelInfo:
    id: str
    type: str  # "stt" | "tts"
    provider: str
    device: str | None = None
    state: ModelState = ModelState.AVAILABLE
    size_mb: int | None = None
    loaded_at: float | None = None
    last_used_at: float | None = None
    is_default: bool = False
    description: str | None = None
    source: str | None = None
    model_format: str | None = None
    provider_available: bool = True

    def to_dict(self) -> dict[str, Any]:
        d = {
            "id": self.id,
            "type": self.type,
            "provider": self.provider,
            "device": self.device,
            "state": self.state.value,
            "size_mb": self.size_mb,
            "loaded_at": self.loaded_at,
            "last_used_at": self.last_used_at,
            "is_default": self.is_default,
            "provider_available": self.provider_available,
        }
        for key in ("description", "source", "model_format"):
            val = getattr(self, key)
            if val:
                d[key] = val
        return d


class ModelManager:
    def __init__(self, stt_router, tts_router) -> None:
        self._stt = stt_router
        self._tts = tts_router

    # ── resolution ────────────────────────────────────────────────────

    def _resolve_type(self, model_id: str) -> str:
        if model_id in getattr(self._tts, "_backends", {}) or any(
            model_id.startswith(p) for p in _TTS_PREFIXES
        ):
            return "tts"
        for m in self._tts.loaded_models():
            if m.model == model_id:
                return "tts"
        return "stt"

    def _provider_from_model(self, model_id: str) -> str:
        known = get_known_model(model_id)
        if known:
            return known["provider"]
        if model_id.startswith(("piper/", "piper-")):
            return "piper"
        if model_id.startswith("pocket-tts"):
            return "pocket-tts"
        if model_id == "kokoro":
            return "kokoro"
        return "jax-whisper"

    def resolve_provider(self, model_id: str) -> str:
        return self._provider_from_model(model_id)

    # ── lifecycle ─────────────────────────────────────────────────────

    def load(
        self, model_id: str, device: str | None = None, _evict_others: bool = True
    ) -> ModelInfo:
        model_type = self._resolve_type(model_id)
        provider = self._provider_from_model(model_id)

        if not _check_provider(model_type, provider, self._stt, self._tts):
            raise ModelLifecycleError(
                message=(
                    f"Provider '{provider}' is not installed for model "
                    f"'{model_id}'."
                ),
                code="provider_missing",
                model_id=model_id,
                provider=provider,
                action="load",
            )

        if _evict_others:
            for m in self.list_loaded():
                if m.type == model_type and m.id != model_id:
                    try:
                        self.unload(m.id)
                        logger.info(
                            "Auto-unloaded %s model %s to load %s",
                            model_type.upper(), m.id, model_id,
                        )
                    except Exception as e:  # noqa: BLE001
                        logger.warning(
                            "Failed to auto-unload %s model %s: %s",
                            model_type.upper(), m.id, e,
                        )

        try:
            target = self._tts if model_type == "tts" else self._stt
            target.load_model(model_id)
            default = (
                settings.tts_model if model_type == "tts" else settings.stt_model
            )
            for m in target.loaded_models():
                if m.model == model_id:
                    return ModelInfo(
                        id=model_id, type=model_type, provider=m.backend,
                        device=m.device, state=ModelState.LOADED,
                        loaded_at=m.loaded_at, last_used_at=m.last_used_at,
                        is_default=(model_id == default), provider_available=True,
                    )
            return ModelInfo(
                id=model_id, type=model_type, provider=provider,
                state=ModelState.LOADED, is_default=(model_id == default),
                provider_available=True,
            )
        except ModelLifecycleError:
            raise
        except Exception as e:  # noqa: BLE001
            raise ModelLifecycleError(
                message=f"Failed to load model '{model_id}': {e}",
                code="load_failed",
                model_id=model_id,
                provider=provider,
                action="load",
                details={"exception": type(e).__name__},
            ) from e

    def download(self, model_id: str) -> ModelInfo:
        provider = self._provider_from_model(model_id)
        try:
            target = (
                self._tts if self._resolve_type(model_id) == "tts" else self._stt
            )
            was_loaded = target.is_model_loaded(model_id)
        except Exception:  # noqa: BLE001
            was_loaded = False
        self.load(model_id, _evict_others=False)
        if not was_loaded:
            self.unload(model_id)
        info = self.status(model_id)
        info.provider = provider
        return info

    def unload(self, model_id: str) -> None:
        if self._resolve_type(model_id) == "tts":
            self._tts.unload_model(model_id)
        else:
            self._stt.unload_model(model_id)

    # ── artifacts ─────────────────────────────────────────────────────

    def _hf_cache_roots(self) -> list[Path]:
        roots: list[Path] = []
        if settings.stt_model_dir:
            roots.append(Path(settings.stt_model_dir).expanduser())
        for root in (
            os.environ.get("HF_HUB_CACHE"),
            os.environ.get("HUGGINGFACE_HUB_CACHE"),
            str(Path.home() / ".cache" / "huggingface" / "hub"),
        ):
            if root:
                p = Path(root).expanduser()
                if p not in roots:
                    roots.append(p)
        return roots

    def _safe_remove_dir(self, path: Path, allowed_roots: list[Path]) -> bool:
        rp = path.resolve()
        for root in allowed_roots:
            rr = root.resolve()
            if rp == rr or rr in rp.parents:
                if rp.exists() and rp.is_dir():
                    shutil.rmtree(rp)
                    return True
        return False

    def _candidate_artifact_paths(self, model_id: str, provider: str) -> list[Path]:
        candidates: list[Path] = []
        for root in self._hf_cache_roots():
            candidates.append(root / f"models--{model_id.replace('/', '--')}")
            if provider == "kokoro":
                candidates.append(root / "models--hexgrad--Kokoro-82M")
        return candidates

    def delete_artifacts(self, model_id: str) -> dict[str, Any]:
        provider = self._provider_from_model(model_id)
        removed_paths: list[str] = []
        try:
            if self.status(model_id).state == ModelState.LOADED:
                self.unload(model_id)
        except Exception:  # noqa: BLE001
            pass

        deleted = False
        if self._resolve_type(model_id) == "stt" and hasattr(
            self._stt, "delete_cached_model"
        ):
            try:
                deleted = bool(self._stt.delete_cached_model(model_id))
            except Exception:  # noqa: BLE001
                deleted = False

        allowed_roots = self._hf_cache_roots()
        for path in self._candidate_artifact_paths(model_id, provider):
            try:
                if self._safe_remove_dir(path, allowed_roots):
                    removed_paths.append(str(path))
                    deleted = True
            except Exception:  # noqa: BLE001
                logger.warning("Failed deleting path %s", path, exc_info=True)

        return {
            "status": "deleted" if deleted else "not_found",
            "model": model_id,
            "provider": provider,
            "deleted_paths": removed_paths,
        }

    # ── listings ──────────────────────────────────────────────────────

    def list_loaded(self) -> list[ModelInfo]:
        result: list[ModelInfo] = []
        for m in self._stt.loaded_models():
            result.append(
                ModelInfo(
                    id=m.model, type="stt", provider=m.backend, device=m.device,
                    state=ModelState.LOADED, loaded_at=m.loaded_at,
                    last_used_at=m.last_used_at,
                    is_default=(m.model == settings.stt_model),
                    provider_available=True,
                )
            )
        for m in self._tts.loaded_models():
            result.append(
                ModelInfo(
                    id=m.model, type="tts", provider=m.backend, device=m.device,
                    state=ModelState.LOADED, loaded_at=m.loaded_at,
                    last_used_at=m.last_used_at,
                    is_default=(m.model == settings.tts_model),
                    provider_available=True,
                )
            )
        return result

    def _base_state(self, is_downloaded: bool) -> ModelState:
        return ModelState.DOWNLOADED if is_downloaded else ModelState.PROVIDER_INSTALLED

    def list_all(self) -> list[ModelInfo]:
        models: dict[str, ModelInfo] = {}
        for m in self.list_loaded():
            models[m.id] = m

        known_types = {m["id"]: m["type"] for m in get_known_models()}
        for cached in self._stt.list_cached_models():
            mid = cached.get("model", cached.get("id", ""))
            if not mid or mid in models:
                continue
            if known_types.get(mid) != "stt":
                continue
            provider = cached.get("backend", self._provider_from_model(mid))
            models[mid] = ModelInfo(
                id=mid, type="stt", provider=provider,
                state=self._base_state(is_downloaded=True),
                size_mb=cached.get("size_mb"),
                is_default=(mid == settings.stt_model),
                provider_available=True,
            )

        for km in get_known_models():
            mid, provider = km["id"], km["provider"]
            is_tts = km["type"] == "tts"
            provider_registered = _check_provider(
                km["type"], provider, self._stt, self._tts
            )
            if mid not in models:
                is_dl = is_tts and any(
                    p.exists()
                    for p in self._candidate_artifact_paths(mid, provider)
                )
                state = (
                    ModelState.PROVIDER_MISSING
                    if is_tts and not provider_registered
                    else self._base_state(is_downloaded=is_dl)
                )
                models[mid] = ModelInfo(
                    id=mid, type=km["type"], provider=provider, state=state,
                    size_mb=km.get("size_mb"),
                    is_default=(mid in (settings.stt_model, settings.tts_model)),
                    description=km.get("description"),
                    source=km.get("source"),
                    model_format=km.get("model_format"),
                    provider_available=provider_registered,
                )
            else:
                existing = models[mid]
                if existing.size_mb is None and km.get("size_mb"):
                    existing.size_mb = km["size_mb"]
                for key in ("description", "source", "model_format"):
                    if not getattr(existing, key, None) and km.get(key):
                        setattr(existing, key, km[key])
                if is_tts and not provider_registered:
                    existing.provider_available = False
                    if existing.state != ModelState.LOADED:
                        existing.state = ModelState.PROVIDER_MISSING

        for default_id, mtype in (
            (settings.stt_model, "stt"),
            (settings.tts_model, "tts"),
        ):
            if default_id not in models:
                provider = self._provider_from_model(default_id)
                registered = _check_provider(mtype, provider, self._stt, self._tts)
                models[default_id] = ModelInfo(
                    id=default_id, type=mtype, provider=provider,
                    state=(
                        ModelState.PROVIDER_MISSING
                        if mtype == "tts" and not registered
                        else self._base_state(is_downloaded=False)
                    ),
                    is_default=True,
                    provider_available=registered if mtype == "tts" else True,
                )
        return list(models.values())

    def status(self, model_id: str) -> ModelInfo:
        for m in self.list_loaded():
            if m.id == model_id:
                return m
        for cached in self._stt.list_cached_models():
            mid = cached.get("model", cached.get("id", ""))
            if mid == model_id:
                provider = cached.get("backend", self._provider_from_model(mid))
                return ModelInfo(
                    id=model_id, type="stt", provider=provider,
                    state=self._base_state(is_downloaded=True),
                    size_mb=cached.get("size_mb"),
                    is_default=(model_id == settings.stt_model),
                    provider_available=True,
                )
        model_type = self._resolve_type(model_id)
        provider = self.resolve_provider(model_id)
        is_dl = False
        provider_available = True
        if model_type == "tts":
            is_dl = any(
                p.exists()
                for p in self._candidate_artifact_paths(model_id, provider)
            )
            provider_available = _check_provider(
                "tts", provider, self._stt, self._tts
            )
        state = (
            ModelState.PROVIDER_MISSING
            if model_type == "tts" and not provider_available
            else self._base_state(is_downloaded=is_dl)
        )
        return ModelInfo(
            id=model_id, type=model_type, provider=provider, state=state,
            is_default=(model_id in (settings.stt_model, settings.tts_model)),
            provider_available=provider_available,
        )

    # ── eviction ──────────────────────────────────────────────────────

    def evict_lru(self) -> None:
        non_default = [m for m in self.list_loaded() if not m.is_default]
        if not non_default:
            return
        non_default.sort(key=lambda m: m.last_used_at or 0)
        oldest = non_default[0]
        logger.info("LRU eviction: unloading %s", oldest.id)
        self.unload(oldest.id)

    def check_ttl(self) -> None:
        ttl = settings.os_model_ttl
        if ttl <= 0:
            return
        now = time.time()
        for m in self.list_loaded():
            if m.is_default:
                continue
            last_used = m.last_used_at or m.loaded_at or now
            if (now - last_used) > ttl:
                logger.info(
                    "TTL eviction: unloading %s (idle %.0fs)", m.id, now - last_used
                )
                self.unload(m.id)
