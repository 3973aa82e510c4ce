"""Fine-tuning additions: loss, train step, lifecycle daemon, batcher pool.

The reference has no training path (SURVEY §5: inference-only) — these are
TPU-build-only components, tested the same pyramid way.
"""

import asyncio
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.config import settings
from open_speech_tpu.models.whisper.model import PRESETS, init_params
from open_speech_tpu.train import (
    init_train_state,
    loss_fn,
    make_optimizer,
    train_step,
)

CFG = PRESETS["test-tiny"]


def _batch(b=2, s=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": jnp.asarray(
            rng.standard_normal((b, CFG.n_mels, CFG.n_audio_ctx * 2)).astype(
                np.float32
            )
        ),
        "tokens": jnp.asarray(
            rng.integers(0, CFG.n_vocab, (b, s)).astype(np.int32)
        ),
        "mask": jnp.ones((b, s), np.int32),
    }


def test_loss_is_finite_scalar():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    loss = loss_fn(params, _batch(), CFG)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    # random model ≈ uniform: NLL near log(V)
    assert abs(float(loss) - np.log(CFG.n_vocab)) < 2.0


def test_train_step_reduces_loss():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(params, opt)
    batch = _batch()
    first = None
    for _ in range(5):
        params, state, loss = train_step(params, state, batch, CFG, opt)
        first = float(loss) if first is None else first
    assert float(loss) < first  # overfits a fixed batch


def test_mask_excludes_padding():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    batch = _batch()
    full = float(loss_fn(params, batch, CFG))
    # masking half the targets changes the mean only via which terms count
    batch2 = dict(batch)
    mask = np.asarray(batch["mask"]).copy()
    mask[:, 4:] = 0
    batch2["mask"] = jnp.asarray(mask)
    partial_loss = float(loss_fn(params, batch2, CFG))
    assert partial_loss != full
    assert np.isfinite(partial_loss)


# ── lifecycle daemon units ───────────────────────────────────────────


class _FakeBackend:
    def __init__(self):
        self._models = {}
        self._last_used = {}

    def load(self, mid, used_at):
        self._models[mid] = object()
        self._last_used[mid] = used_at

    def unload_model(self, mid):
        self._models.pop(mid, None)
        self._last_used.pop(mid, None)


class _FakeRouter:
    def __init__(self):
        self._default_backend = _FakeBackend()
        self._lock = asyncio.Lock()


def test_idle_victims_respect_ttl_and_default(monkeypatch):
    from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager

    monkeypatch.setattr(settings, "os_model_ttl", 100)
    monkeypatch.setattr(settings, "stt_model", "default-model")
    router = _FakeRouter()
    now = time.time()
    router._default_backend.load("default-model", now - 1000)  # stale default
    router._default_backend.load("idle-model", now - 1000)
    router._default_backend.load("fresh-model", now - 10)
    mgr = ModelLifecycleManager(router)
    victims = mgr._idle_victims(router._default_backend, now)
    assert victims == ["idle-model"]  # default exempt, fresh kept


def test_overflow_victims_lru_order(monkeypatch):
    from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager

    monkeypatch.setattr(settings, "os_max_loaded_models", 2)
    monkeypatch.setattr(settings, "stt_model", "default-model")
    router = _FakeRouter()
    now = time.time()
    for i, mid in enumerate(["a", "b", "c", "default-model"]):
        router._default_backend.load(mid, now + i)
    mgr = ModelLifecycleManager(router)
    victims = mgr._overflow_victims(router._default_backend)
    assert victims == ["a", "b"]  # oldest first, default never evicted


def test_sweep_unloads(monkeypatch):
    from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager

    monkeypatch.setattr(settings, "os_model_ttl", 100)
    monkeypatch.setattr(settings, "os_max_loaded_models", 0)
    monkeypatch.setattr(settings, "stt_model", "default-model")
    router = _FakeRouter()
    router._default_backend.load("idle-model", time.time() - 1000)
    mgr = ModelLifecycleManager(router)
    asyncio.new_event_loop().run_until_complete(mgr._sweep())
    assert "idle-model" not in router._default_backend._models


# ── batcher pool ─────────────────────────────────────────────────────


def test_pool_stats_shape(monkeypatch):
    from open_speech_tpu.runtime import batcher_pool
    from open_speech_tpu.runtime.batcher import ContinuousBatcher
    from open_speech_tpu.models.whisper.tokenizer import FallbackTokenizer

    batcher_pool.reset_pool()
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)
    b = ContinuousBatcher(params, CFG, tok.special, slots=2, max_new_tokens=4)
    batcher_pool._batchers[("m", "en", "transcribe")] = b
    try:
        stats = batcher_pool.pool_stats()
        row = stats["m/en/transcribe"]
        assert row["slots"] == 2
        assert row["occupancy"] == 0
        assert {"ticks", "completed", "peak_occupancy"} <= set(row)
    finally:
        batcher_pool.reset_pool()
