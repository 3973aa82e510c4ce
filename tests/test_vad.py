"""VAD: device stepper behavior + hysteresis segmentation with scripted probs.

Mirrors the reference test strategy (tests/test_vad.py uses MockOrtSession
returning scripted probabilities) via the injectable step_fn.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.models.vad import (
    Segment,
    SileroVAD,
    get_vad_model,
    init_vad_params,
    vad_step,
)


def scripted(probs):
    """step_fn returning a scripted probability sequence."""
    it = iter(probs)

    def fn(window, state):
        return next(it), state

    return fn


def _pcm(n_windows: int) -> bytes:
    return (np.ones(512 * n_windows, dtype=np.int16) * 1000).tobytes()


def test_vad_step_shapes_and_state():
    params = init_vad_params()
    audio = jnp.zeros((3, 512))
    state = jnp.zeros((2, 3, 128))
    probs, new_state = vad_step(params, audio, state)
    assert probs.shape == (3,)
    assert new_state.shape == (2, 3, 128)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
    # state evolves
    probs2, state2 = vad_step(params, jnp.ones((3, 512)) * 0.1, new_state)
    assert not np.allclose(np.asarray(new_state), np.asarray(state2))


def test_vad_state_is_per_stream():
    params = init_vad_params()
    a = SileroVAD(params)
    b = SileroVAD(params)
    rng = np.random.default_rng(0)
    a(rng.uniform(-0.5, 0.5, 1024).astype(np.float32))
    assert not np.allclose(a._state, b._state)
    a.reset()
    assert np.allclose(a._state, b._state)


def test_call_returns_max_prob():
    vad = SileroVAD(None, step_fn=scripted([0.1, 0.9, 0.3]))
    prob = vad(np.zeros(512 * 3, dtype=np.float32))
    assert prob == pytest.approx(0.9)


def test_call_empty_audio():
    vad = SileroVAD(None, step_fn=scripted([]))
    assert vad(np.zeros(0, dtype=np.float32)) == 0.0


def test_is_speech_threshold():
    vad = SileroVAD(None, threshold=0.5, step_fn=scripted([0.6]))
    assert vad.is_speech(_pcm(1)) is True
    vad2 = SileroVAD(None, threshold=0.5, step_fn=scripted([0.4]))
    assert vad2.is_speech(_pcm(1)) is False
    assert SileroVAD(None, step_fn=scripted([])).is_speech(b"") is False


def test_segments_basic():
    # 10 windows: 4 speech, 6 silence -> one segment closed by silence
    probs = [0.9] * 4 + [0.1] * 6
    vad = SileroVAD(None, step_fn=scripted(probs))
    segs = vad.get_speech_segments(
        _pcm(10), min_speech_ms=96, silence_ms=96
    )  # 3 windows each
    assert len(segs) == 1
    assert segs[0].start_ms == 0
    # closes after 3 silence windows: at window index 6 (192ms into silence)
    assert segs[0].end_ms == 6 * 32


def test_segments_min_speech_filter():
    # 1 speech window < min_speech -> no segment
    probs = [0.9] + [0.1] * 8
    vad = SileroVAD(None, step_fn=scripted(probs))
    segs = vad.get_speech_segments(_pcm(9), min_speech_ms=96, silence_ms=64)
    assert segs == []


def test_segments_open_at_end():
    probs = [0.1] * 2 + [0.9] * 5
    vad = SileroVAD(None, step_fn=scripted(probs))
    segs = vad.get_speech_segments(_pcm(7), min_speech_ms=96, silence_ms=800)
    assert len(segs) == 1
    assert segs[0].start_ms == 2 * 32
    assert segs[0].end_ms == 7 * 32


def test_segments_brief_dip_does_not_split():
    # dip of 1 silence window (< silence_windows) keeps the segment open
    probs = [0.9] * 3 + [0.1] + [0.9] * 3 + [0.1] * 5
    vad = SileroVAD(None, step_fn=scripted(probs))
    segs = vad.get_speech_segments(_pcm(12), min_speech_ms=96, silence_ms=128)
    assert len(segs) == 1
    assert segs[0].start_ms == 0


def test_get_vad_model_singleton():
    import asyncio

    async def go():
        a = await get_vad_model()
        b = await get_vad_model()
        return a, b

    a, b = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())
    assert a is b


def test_vad_scan_matches_stepwise():
    """vad_scan (one device call per chunk, bucket-padded) must produce
    exactly the stepwise probabilities and the same recurrent state after
    the real window count — padding must never leak into the recurrence."""
    import jax
    import jax.numpy as jnp

    from open_speech_tpu.models.vad.silero import (
        _HIDDEN,
        WINDOW,
        init_vad_params,
        vad_scan,
        vad_step,
    )

    params = init_vad_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    n = 7  # pads to bucket 8
    windows = rng.uniform(-0.5, 0.5, (n, WINDOW)).astype(np.float32)

    state = jnp.zeros((2, 1, _HIDDEN))
    seq_probs = []
    for i in range(n):
        p, state = vad_step(params, jnp.asarray(windows[i][None]), state)
        seq_probs.append(float(p[0]))

    padded = np.pad(windows, ((0, 1), (0, 0)))
    probs, final = vad_scan(
        params, jnp.asarray(padded), jnp.zeros((2, 1, _HIDDEN)), jnp.int32(n)
    )
    np.testing.assert_allclose(
        np.asarray(probs[:n]), np.asarray(seq_probs), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(state), rtol=0, atol=1e-6
    )
