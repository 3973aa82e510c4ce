"""Pocket-TTS slot-pool batcher: row independence, joins, recycling.

The contract under test (runtime/pocket_batcher.py): a session batched
with any number of concurrent neighbours produces the same audio as the
same request run alone through PocketTTS.generate_stream — the property
that lets concurrent serving share fused device programs without
changing what any caller hears. Replaces the reference's
one-request-per-thread pocket path (src/main.py:781-828).
"""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

import jax

from open_speech_tpu.models.pocket.model import PocketTTS
from open_speech_tpu.runtime.pocket_batcher import PocketBatcher


@pytest.fixture(scope="module")
def tts():
    return PocketTTS.random_init(jax.random.PRNGKey(11))


@pytest.fixture()
def batcher(tts):
    b = PocketBatcher(tts, slots=4, block_frames=2)
    yield b
    b.stop()


def _solo(tts, text, state=None, max_frames=None):
    kw = {"block_frames": 2}
    if max_frames is not None:
        kw["max_frames"] = max_frames
    blocks = list(tts.generate_stream(text, state, **kw))
    return np.concatenate(blocks) if blocks else np.zeros((0,), np.float32)


def _batched(batcher, text, state=None, max_frames=None):
    blocks = list(batcher.synthesize(text, state, max_frames))
    return np.concatenate(blocks) if blocks else np.zeros((0,), np.float32)


def test_single_job_matches_solo(tts, batcher):
    text = "hello world"
    ref = _solo(tts, text, max_frames=6)
    got = _batched(batcher, text, max_frames=6)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_partial_final_block(tts, batcher):
    """A frame budget not divisible by the block emits the exact tail."""
    ref = _solo(tts, "odd", max_frames=5)
    got = _batched(batcher, "odd", max_frames=5)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_concurrent_rows_are_independent(tts, batcher):
    """Different texts/voices batched together == each alone."""
    prompts = [
        ("the quick brown fox", None, 8),
        ("jumps over", None, 6),
        ("a lazy dog", None, 5),
    ]
    state = tts.state_for_audio_prompt(
        np.sin(np.linspace(0, 80.0, 2 * tts.mimi_cfg.samples_per_frame))
        .astype(np.float32)
    )
    prompts.append(("cloned voice", state, 6))

    refs = [_solo(tts, t, s, m) for t, s, m in prompts]

    results: list[np.ndarray | None] = [None] * len(prompts)
    errs: list[Exception] = []

    def run(i):
        try:
            t, s, m = prompts[i]
            results[i] = _batched(batcher, t, s, m)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errs, errs
    for got, ref in zip(results, refs):
        assert got is not None and got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    assert batcher.stats["peak_live"] >= 2  # they actually shared the pool


def test_slot_recycling_after_completion(tts, batcher):
    """More sequential jobs than slots: recycled rows stay exact."""
    ref = _solo(tts, "again", max_frames=4)
    for _ in range(6):  # > slots=4
        got = _batched(batcher, "again", max_frames=4)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_late_join_mid_flight(tts, batcher):
    """A request arriving while another is mid-generation is correct."""
    ref_a = _solo(tts, "first utterance going long", max_frames=12)
    ref_b = _solo(tts, "late", max_frames=4)

    got_a: list[np.ndarray] = []
    done_a = threading.Event()

    def run_a():
        for blk in batcher.synthesize("first utterance going long", None, 12):
            got_a.append(blk)
        done_a.set()

    th = threading.Thread(target=run_a)
    th.start()
    # wait for the first block so the pool is mid-flight, then join
    t0 = time.time()
    while not got_a and time.time() - t0 < 60:
        time.sleep(0.005)
    assert got_a, "first stream produced nothing in 60s"
    got_b = _batched(batcher, "late", max_frames=4)
    th.join(timeout=60)
    assert done_a.is_set()
    np.testing.assert_allclose(
        np.concatenate(got_a), ref_a, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(got_b, ref_b, atol=2e-5, rtol=1e-4)


def test_queueing_beyond_slots(tts):
    """More concurrent jobs than slots: the overflow waits, all finish."""
    b = PocketBatcher(tts, slots=2, block_frames=2)
    try:
        ref = _solo(tts, "overflow", max_frames=4)
        results: list[np.ndarray | None] = [None] * 5
        errs: list[Exception] = []

        def run(i):
            try:
                results[i] = _batched(b, "overflow", max_frames=4)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=run, args=(i,)) for i in range(5)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert not errs, errs
        for got in results:
            assert got is not None
            np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    finally:
        b.stop()


def test_stop_fails_pending(tts):
    b = PocketBatcher(tts, slots=2, block_frames=2)
    list(b.synthesize("warm", None, 4))
    b.stop()
    with pytest.raises(RuntimeError):
        list(b.synthesize("after stop", None, 4))


def test_context_exhausted_emits_nothing(tts):
    """A prompt state filling max_ctx yields an empty (not hung) stream."""
    b = PocketBatcher(tts, slots=2, block_frames=2)
    try:
        cfg = tts.lm_cfg
        import jax.numpy as jnp

        from open_speech_tpu.models.pocket.lm import init_caches
        from open_speech_tpu.models.pocket.model import PromptState

        caches = init_caches(cfg, 1, tts.lm_params["text_emb"].dtype)
        state = PromptState(*caches, length=cfg.max_ctx - 2)
        out = list(b.synthesize("text", state, 4))
        assert out == []
    finally:
        b.stop()
