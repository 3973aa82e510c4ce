"""Background model eviction daemon (reference behavior: src/lifecycle.py).

Every 30 s: drop non-default models idle past OS_MODEL_TTL, then trim to
OS_MAX_LOADED_MODELS oldest-first. Eviction happens under the router lock.
"""

from __future__ import annotations

import asyncio
import logging
import time

from open_speech_tpu.config import settings

logger = logging.getLogger(__name__)

_SWEEP_INTERVAL_S = 30


class ModelLifecycleManager:
    def __init__(self, router) -> None:
        self._router = router
        self._task: asyncio.Task | None = None

    def start(self) -> None:
        self._task = asyncio.create_task(self._run())
        logger.info(
            "Model lifecycle started (ttl=%ds, max_loaded=%d)",
            settings.os_model_ttl,
            settings.os_max_loaded_models,
        )

    async def stop(self) -> None:
        task, self._task = self._task, None
        if task is None:
            return
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass

    async def _run(self) -> None:
        while True:
            await asyncio.sleep(_SWEEP_INTERVAL_S)
            try:
                await self._sweep()
            except Exception:  # noqa: BLE001
                logger.exception("Lifecycle eviction error")

    def _idle_victims(self, backend, now: float) -> list[str]:
        ttl = settings.os_model_ttl
        if ttl <= 0:
            return []
        return [
            model_id
            for model_id in list(backend._models)
            if model_id != settings.stt_model
            and now - backend._last_used.get(model_id, now) > ttl
        ]

    def _overflow_victims(self, backend) -> list[str]:
        limit = settings.os_max_loaded_models
        if limit <= 0:
            return []
        excess = len(backend._models) - limit
        if excess <= 0:
            return []
        candidates = sorted(
            (m for m in backend._models if m != settings.stt_model),
            key=lambda m: backend._last_used.get(m, 0),
        )
        return candidates[:excess]

    async def _sweep(self) -> None:
        backend = self._router._default_backend
        now = time.time()
        for model_id in self._idle_victims(backend, now):
            logger.info(
                "TTL eviction: unloading %s (idle %.0fs)",
                model_id,
                now - backend._last_used.get(model_id, 0),
            )
            async with self._router._lock:
                backend.unload_model(model_id)
        for model_id in self._overflow_victims(backend):
            logger.info(
                "LRU eviction: unloading %s (max_loaded=%d)",
                model_id,
                settings.os_max_loaded_models,
            )
            async with self._router._lock:
                backend.unload_model(model_id)
