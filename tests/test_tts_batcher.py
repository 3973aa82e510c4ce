"""TTS request batching: correctness, concurrency, serving integration."""

import threading

import numpy as np
import pytest

import jax

from open_speech_tpu.config import settings
from open_speech_tpu.models.kokoro import init_kokoro_params, voice_vector
from open_speech_tpu.models.kokoro.model import TINY_CONFIG
from open_speech_tpu.runtime.tts_batcher import (
    TTSBatcher,
    reset_tts_batchers,
)
from open_speech_tpu.text.g2p import get_g2p


@pytest.fixture(scope="module")
def batcher():
    params = init_kokoro_params(jax.random.PRNGKey(7), TINY_CONFIG)
    return TTSBatcher(params, TINY_CONFIG)


def _job(text="batch check", voice="af_heart"):
    ids = get_g2p().to_ids(text)[: TINY_CONFIG.max_phonemes]
    style = voice_vector(voice, 2 * TINY_CONFIG.style_dim)
    return ids, style


def test_single_job_roundtrip(batcher):
    ids, style = _job()
    chunks = list(batcher.synthesize(ids, style, 1.0))
    assert chunks and all(c.dtype == np.float32 for c in chunks)
    audio = np.concatenate(chunks)
    assert audio.size % TINY_CONFIG.samples_per_frame == 0
    assert np.isfinite(audio).all()


def test_concurrent_jobs_share_batches(batcher):
    """Jobs submitted together must ride shared device batches, and each
    job's audio must be independent of its co-batched peers."""
    texts = ["first request", "the second one is longer than the first",
             "third", "a fourth concurrent request"]
    solo = [
        np.concatenate(list(batcher.synthesize(*_job(t), 1.0)))
        for t in texts
    ]
    batches_before = batcher.stats["batches"]

    results = [None] * len(texts)

    def worker(i):
        results[i] = np.concatenate(
            list(batcher.synthesize(*_job(texts[i]), 1.0))
        )

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(texts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    assert batcher.stats["peak_batch"] >= 2  # genuinely batched
    assert batcher.stats["batches"] - batches_before < len(texts)
    for got, want in zip(results, solo):
        assert got is not None
        assert len(got) == len(want)  # same durations row-independent
        # same audio regardless of co-batched peers (fp noise only)
        scale = np.abs(want).max() + 1e-9
        assert np.abs(got - want).max() / scale < 0.02


def test_speed_respected_in_batch(batcher):
    ids, style = _job("speed inside the batch")
    slow = np.concatenate(list(batcher.synthesize(ids, style, 0.5)))
    fast = np.concatenate(list(batcher.synthesize(ids, style, 2.0)))
    assert len(slow) > len(fast)


def test_backend_routes_through_batcher(monkeypatch):
    reset_tts_batchers()
    monkeypatch.setattr(settings, "os_tts_batcher_enabled", True)
    from open_speech_tpu.runtime import tts_batcher as tb
    from open_speech_tpu.tts.backends.kokoro_backend import KokoroBackend

    backend = KokoroBackend()
    backend.load_model("kokoro")
    chunks = list(backend.synthesize("served through the batcher", "af_heart"))
    assert chunks and all(np.isfinite(c).all() for c in chunks)
    stats = tb.tts_batcher_stats()
    assert stats and sum(s["jobs"] for s in stats.values()) >= 1
    reset_tts_batchers()


def test_stop_ends_thread_and_releases_params():
    """A stopped batcher's scheduler thread exits and drops the params
    reference — a replaced batcher must not pin the old weights."""
    from open_speech_tpu.runtime.tts_batcher import TTSBatcher

    cfg = TINY_CONFIG
    params = init_kokoro_params(jax.random.PRNGKey(0), cfg)
    b = TTSBatcher(params, cfg)
    chunks = list(b.synthesize(list(range(1, 9)),
                               np.zeros(2 * cfg.style_dim, np.float32), 1.0))
    assert chunks
    thread = b._thread
    b.stop()
    thread.join(timeout=10)
    assert not thread.is_alive()
    assert b.params is None
    with pytest.raises(RuntimeError):
        next(iter(b.synthesize([1], np.zeros(2 * cfg.style_dim), 1.0)))


def test_replacing_batcher_stops_previous():
    """get_tts_batcher stops the superseded batcher on params change
    (model reload) instead of leaking its thread + weights."""
    from types import SimpleNamespace

    from open_speech_tpu.runtime.tts_batcher import (
        get_tts_batcher,
        reset_tts_batchers,
    )

    cfg = TINY_CONFIG
    backend = SimpleNamespace(
        _params=init_kokoro_params(jax.random.PRNGKey(1), cfg), _cfg=cfg
    )
    try:
        b1 = get_tts_batcher(backend)
        backend._params = init_kokoro_params(jax.random.PRNGKey(2), cfg)
        b2 = get_tts_batcher(backend)
        assert b2 is not b1
        assert b1._stopping  # superseded batcher was stopped
    finally:
        reset_tts_batchers()


def test_max_batch_clamped_to_bucket_ladder():
    from open_speech_tpu.runtime.tts_batcher import (
        BATCH_BUCKETS,
        TTSBatcher,
    )

    assert (
        TTSBatcher(None, TINY_CONFIG, max_batch=128).max_batch
        == BATCH_BUCKETS[-1]
    )
