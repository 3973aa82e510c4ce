"""Shared batcher pool: one ContinuousBatcher per (model, language, task).

Streaming/realtime sessions submit mel windows here instead of running whole
model invocations on executor threads (the reference's per-request model:
src/streaming.py:50 4-thread executor + full re-transcription per chunk) —
every live session's decode advances in one device step per tick. Opt-in via
OS_BATCHER_ENABLED; keyed per prompt configuration because a batcher's slots
share their prompt prefill. No reference counterpart (SURVEY §2.8).
"""

from __future__ import annotations

import asyncio
import logging

from open_speech_tpu.config import settings
from open_speech_tpu.runtime.batcher import ContinuousBatcher

logger = logging.getLogger(__name__)

_batchers: dict[tuple, ContinuousBatcher] = {}
_lock: asyncio.Lock | None = None
_lock_loop: asyncio.AbstractEventLoop | None = None


def _pool_lock() -> asyncio.Lock:
    """The pool mutex, bound to the *running* loop.

    A module-level ``asyncio.Lock`` binds to whichever loop first acquires
    it; if that loop dies while a holder task is destroyed the lock stays
    locked forever and every later loop raises ``bound to a different event
    loop``. Recreating it per loop is safe: batchers from a dead loop are
    unusable anyway (their scheduler task died with the loop) and are
    dropped by the loop check in :func:`get_batcher`."""
    global _lock, _lock_loop
    loop = asyncio.get_running_loop()
    if _lock is None or _lock_loop is not loop:
        _lock = asyncio.Lock()
        _lock_loop = loop
    return _lock


def _on_live_loop(batcher) -> bool:
    loop = getattr(batcher, "_bound_loop", None)
    if loop is None:
        # never start()ed through the pool (tests inject fakes): treat as
        # live so it still gets a graceful drain on the current loop
        return True
    try:
        return loop is asyncio.get_running_loop()
    except RuntimeError:  # pragma: no cover - no running loop
        return False


async def _retire(batcher) -> None:
    for _ in range(600):  # up to ~60 s of draining
        if batcher.occupancy == 0 and batcher._queue.empty():
            break
        await asyncio.sleep(0.1)
    await batcher.stop()


def _is_current(batcher, backend, model_id: str) -> bool:
    # compare against the SOURCE params identity recorded at construction:
    # ContinuousBatcher may re-shard params in __init__ (a new pytree), so
    # `entry["params"] is batcher.params` would be permanently false and
    # every call would churn a fresh multi-GB KV pool
    entry = getattr(backend, "_models", {}).get(model_id)
    source = getattr(batcher, "_source_params", batcher.params)
    return entry is not None and entry.get("params") is source


async def get_batcher(
    backend, model_id: str, language: str | None, task: str = "transcribe"
) -> ContinuousBatcher:
    key = (model_id, language or "en", task)
    live = _batchers.get(key)
    if (
        live is not None
        and _on_live_loop(live)
        and _is_current(live, backend, model_id)
    ):
        return live
    async with _pool_lock():
        live = _batchers.get(key)
        if live is not None:
            if not _on_live_loop(live):
                # scheduler task died with a previous event loop: nothing
                # to drain (its futures are gone too) — just drop it
                del _batchers[key]
            elif _is_current(live, backend, model_id):
                return live
            else:
                # model was unloaded/reloaded: a stale batcher would pin the
                # evicted weights AND decode with old params. Retire it after
                # its in-flight work drains (stopping now would fail live
                # futures mid-utterance).
                del _batchers[key]
                asyncio.get_running_loop().create_task(_retire(live))
        # model load = disk read + warmup compiles (minutes on a cold
        # cache): never run it on the event loop (_load_lock makes the
        # backend call thread-safe)
        entry = await asyncio.get_running_loop().run_in_executor(
            None, backend._ensure_model, model_id
        )
        mesh = None
        if (settings.os_tpu_mesh or "").strip():
            # the backend shards params at load when OS_TPU_MESH is set
            # (jax_whisper._maybe_shard); the batcher needs the same mesh so
            # its KV pool co-shards with them instead of pinning to device 0
            try:
                from open_speech_tpu.parallel.mesh import mesh_from_settings

                mesh = mesh_from_settings()
            except Exception:  # noqa: BLE001 — serve unsharded, as backend does
                logger.exception("OS_TPU_MESH invalid; batcher unsharded")
        batcher = ContinuousBatcher(
            entry["params"],
            entry["cfg"],
            entry["tok"].special,
            slots=settings.os_batch_max_sessions,
            max_new_tokens=min(224, settings.os_batch_max_tokens),
            language=language or "en",
            task=task,
            suppress_tokens=tuple(entry["tok"].non_speech_tokens),
            mesh=mesh,
        )
        batcher._source_params = entry["params"]
        batcher.start()
        _batchers[key] = batcher
        logger.info(
            "Continuous batcher started for %s (lang=%s, slots=%d)",
            model_id, language or "en", settings.os_batch_max_sessions,
        )
        return batcher


async def transcribe_pcm_batched(
    backend, model_id: str, language: str, pcm, task: str = "transcribe"
) -> dict:
    """One utterance window through the shared batcher: mel framing,
    duration-scaled token budget, token decode. The single batched-STT
    entry both streaming sessions (server/streaming.py) and realtime
    commits (server/realtime/server.py) submit through."""
    import jax.numpy as jnp
    import numpy as np

    from open_speech_tpu.ops.mel import log_mel_spectrogram, pad_or_trim

    entry = await asyncio.get_running_loop().run_in_executor(
        None, backend._ensure_model, model_id
    )
    cfg, tok = entry["cfg"], entry["tok"]
    batcher = await get_batcher(backend, model_id, language, task)
    window_samples = cfg.n_audio_ctx * 2 * 160
    duration_s = len(pcm) / 16000

    def _mel() -> np.ndarray:
        # Device compute + the blocking np.asarray sync stay off the
        # event loop: the first call compiles the mel program (seconds
        # through a TPU tunnel) and every call blocks until device-done.
        return np.asarray(
            log_mel_spectrogram(
                pad_or_trim(jnp.asarray(pcm), window_samples),
                n_mels=cfg.n_mels,
            )
        )

    mel = await asyncio.get_running_loop().run_in_executor(None, _mel)
    budget = -(-min(224, int(duration_s * 12) + 12) // 16) * 16
    tokens = await batcher.transcribe_window(mel, max_new_tokens=budget)
    return {"text": tok.decode(tokens).strip()}


async def shutdown_batchers() -> None:
    for batcher in list(_batchers.values()):
        if _on_live_loop(batcher):
            await batcher.stop()
    _batchers.clear()


async def retire_stale(backend) -> int:
    """Retire batchers whose backing model was unloaded or reloaded.

    Called by the lifecycle daemon after each eviction sweep so an evicted
    model's weights + KV pools don't stay pinned by a batcher nobody will
    use again (the pool itself only notices staleness on the next request
    for the exact same key)."""
    stale = []
    removed = 0
    async with _pool_lock():
        for key, batcher in list(_batchers.items()):
            if not _is_current(batcher, backend, key[0]):
                del _batchers[key]
                removed += 1
                # dead-loop batchers are dropped without a drain task
                # (their scheduler + futures died with the old loop)
                if _on_live_loop(batcher):
                    stale.append(batcher)
    for batcher in stale:
        asyncio.get_running_loop().create_task(_retire(batcher))
    return removed


def reset_pool() -> None:
    """Test hook: drop batchers without awaiting (fresh event loops)."""
    global _lock, _lock_loop
    _batchers.clear()
    _lock = None
    _lock_loop = None


def pool_stats() -> dict:
    """Per-batcher occupancy/throughput for /metrics and /api/stats
    (SURVEY §5: batch occupancy is a first-class observability surface)."""
    out = {}
    for (model_id, lang, task), b in _batchers.items():
        out[f"{model_id}/{lang}/{task}"] = {
            **b.stats,
            "occupancy": b.occupancy,
            "slots": b.n_slots,
        }
    return out
