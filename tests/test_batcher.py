"""Continuous batcher: slot decode parity, concurrent multiplexing, reuse."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    init_params,
)
from open_speech_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from open_speech_tpu.models.whisper.model import encode
from open_speech_tpu.ops.mel import log_mel_spectrogram, pad_or_trim
from open_speech_tpu.runtime.batcher import ContinuousBatcher

CFG = PRESETS["test-tiny"]


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tok = FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)
    return params, tok


def _mel(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    audio = rng.uniform(-0.3, 0.3, CFG.n_audio_ctx * 2 * 160).astype(np.float32)
    return np.asarray(
        log_mel_spectrogram(jnp.asarray(audio), n_mels=CFG.n_mels)
    )


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_single_window_matches_unbatched_greedy(setup):
    """A lone request through the batcher == plain greedy decode."""
    params, tok = setup
    sp = tok.special
    mel = _mel(0)

    async def go():
        b = ContinuousBatcher(
            params, CFG, sp, slots=4, max_new_tokens=8, timestamps=True
        )
        b.start()
        try:
            return await asyncio.wait_for(
                b.transcribe_window(mel), timeout=120
            )
        finally:
            await b.stop()

    got = _run(go())

    enc = encode(params, jnp.asarray(mel)[None], CFG)
    prompt = np.array([sp.sot_sequence("en", "transcribe")], np.int32)
    ref = greedy_decode(
        params, CFG, sp, enc, prompt, DecodeOptions(max_new_tokens=8)
    )
    ref_tokens = [int(t) for t in ref.tokens[0][: int(ref.lengths[0])]]
    assert got == ref_tokens


def test_concurrent_windows_multiplex(setup):
    params, tok = setup
    sp = tok.special

    async def go():
        b = ContinuousBatcher(
            params, CFG, sp, slots=4, max_new_tokens=6, timestamps=True
        )
        b.start()
        try:
            results = await asyncio.wait_for(
                asyncio.gather(
                    *(b.transcribe_window(_mel(i)) for i in range(6))
                ),
                timeout=300,
            )
        finally:
            await b.stop()
        return results, b.stats

    results, stats = _run(go())
    assert len(results) == 6
    assert stats["completed"] == 6
    assert stats["peak_occupancy"] >= 2  # actually batched
    for toks in results:
        assert len(toks) <= 6
        assert all(0 <= t < CFG.n_vocab for t in toks)


def test_batcher_deterministic_across_runs(setup):
    """The same cohort decodes to identical tokens on repeated runs.

    (Exact solo-vs-cohort equality does not hold with random weights: the
    encoder's batch dimension changes XLA reduction order, and random-weight
    logits are near-ties; with trained weights outputs agree semantically.)
    """
    params, tok = setup
    sp = tok.special

    async def crowd():
        b = ContinuousBatcher(params, CFG, sp, slots=4, max_new_tokens=6)
        b.start()
        try:
            return await asyncio.wait_for(
                asyncio.gather(
                    *(b.transcribe_window(_mel(i)) for i in (3, 7, 11))
                ),
                300,
            )
        finally:
            await b.stop()

    assert _run(crowd()) == _run(crowd())


def test_slot_reuse_beyond_pool_size(setup):
    params, tok = setup
    sp = tok.special

    async def go():
        b = ContinuousBatcher(params, CFG, sp, slots=2, max_new_tokens=4)
        b.start()
        try:
            results = await asyncio.wait_for(
                asyncio.gather(
                    *(b.transcribe_window(_mel(i)) for i in range(5))
                ),
                300,
            )
        finally:
            await b.stop()
        return results, b.occupancy

    results, occupancy = _run(go())
    assert len(results) == 5
    assert occupancy == 0  # all slots retired


def test_oversized_budget_clamped_to_pool_capacity(setup):
    """A request asking for more tokens than the slot pool's KV capacity is
    clamped (the pool's self-KV is sized to the construction-time budget)."""
    params, tok = setup
    sp = tok.special

    async def go():
        b = ContinuousBatcher(params, CFG, sp, slots=1, max_new_tokens=4)
        b.start()
        try:
            out = await asyncio.wait_for(
                b.transcribe_window(_mel(0), max_new_tokens=10_000), 300
            )
        finally:
            await b.stop()
        return out, b._cache_len

    out, cache_len = _run(go())
    assert len(out) <= cache_len  # never exceeds the pool's KV positions


def test_bad_admission_fails_only_that_request(setup):
    """A malformed submission (wrong mel shape) fails its own future and
    leaves the batcher serving: a concurrent healthy request and a
    follow-up request both complete."""
    params, tok = setup
    sp = tok.special

    async def go():
        b = ContinuousBatcher(params, CFG, sp, slots=4, max_new_tokens=8)
        b.start()
        try:
            good = asyncio.create_task(
                b.transcribe_window(_mel(1))
            )
            bad = asyncio.create_task(
                b.transcribe_window(_mel(2)[:, :7])  # wrong window length
            )
            done = await asyncio.wait_for(
                asyncio.gather(good, bad, return_exceptions=True), 300
            )
            after = await asyncio.wait_for(b.transcribe_window(_mel(3)), 300)
        finally:
            await b.stop()
        return done, after

    (good_res, bad_res), after = _run(go())
    ok = [r for r in (good_res, bad_res) if isinstance(r, list)]
    errs = [r for r in (good_res, bad_res) if isinstance(r, Exception)]
    assert len(errs) == 1, (good_res, bad_res)  # exactly the malformed one
    assert len(ok) == 1
    assert isinstance(after, list)  # scheduler survived


def test_tick_failure_recovers_and_serves_again(setup, monkeypatch):
    """A device failure mid-tick fails the in-flight request but the
    batcher rebuilds its (donated) KV pool and serves the next request —
    the advertised fail-slots-keep-serving behavior."""
    import open_speech_tpu.runtime.batcher as batcher_mod

    params, tok = setup
    sp = tok.special
    real_block = batcher_mod._slot_decode_block
    boom = {"n": 1}

    def flaky_block(*args, **kwargs):
        if boom["n"]:
            boom["n"] -= 1
            raise RuntimeError("injected device error")
        return real_block(*args, **kwargs)

    monkeypatch.setattr(batcher_mod, "_slot_decode_block", flaky_block)

    async def go():
        b = ContinuousBatcher(params, CFG, sp, slots=2, max_new_tokens=8)
        b.start()
        try:
            first = await asyncio.wait_for(
                asyncio.gather(
                    b.transcribe_window(_mel(4)), return_exceptions=True
                ),
                300,
            )
            second = await asyncio.wait_for(b.transcribe_window(_mel(5)), 300)
        finally:
            await b.stop()
        return first[0], second

    first, second = _run(go())
    assert isinstance(first, Exception)  # in-flight request failed honestly
    assert isinstance(second, list)  # pool was rebuilt; serving continued


def test_giveup_fails_queued_requests(setup, monkeypatch):
    """When the loop gives up after repeated failures, queued-but-never-
    admitted futures are failed too instead of hanging forever."""
    import open_speech_tpu.runtime.batcher as batcher_mod

    params, tok = setup
    sp = tok.special

    def always_boom(*args, **kwargs):
        raise RuntimeError("persistent device error")

    monkeypatch.setattr(batcher_mod, "_slot_decode_block", always_boom)

    async def go():
        # 1 slot: the second submission stays queued while the first fails
        b = ContinuousBatcher(params, CFG, sp, slots=1, max_new_tokens=8)
        b.start()
        try:
            t1 = asyncio.create_task(b.transcribe_window(_mel(6)))
            t2 = asyncio.create_task(b.transcribe_window(_mel(7)))
            t3 = asyncio.create_task(b.transcribe_window(_mel(8)))
            return await asyncio.wait_for(
                asyncio.gather(t1, t2, t3, return_exceptions=True), 300
            )
        finally:
            await b.stop()

    results = _run(go())
    assert all(isinstance(r, Exception) for r in results), results
