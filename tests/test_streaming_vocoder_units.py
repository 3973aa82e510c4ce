"""Blockwise-vocoder unit matrix: wire formats, block sizing, emission.

Complements the parity tests in test_tts.py with the mechanical
contracts the serving layer depends on: exact per-block sample counts,
first-block sizing, int16 wire equivalence, and the tiny-bucket
fallback.
"""

import numpy as np
import pytest

import jax

from open_speech_tpu.models.kokoro import init_kokoro_params
from open_speech_tpu.models.kokoro.model import (
    TINY_CONFIG,
    _unwire,
    _wire,
    vocode_streaming,
)
from tests.test_tts import _kokoro_encode


@pytest.fixture(scope="module")
def encoded():
    params = init_kokoro_params(jax.random.PRNGKey(7), TINY_CONFIG)
    g, n_frames = _kokoro_encode(
        "a sentence long enough to span several vocoder blocks when "
        "streaming", TINY_CONFIG, params,
    )
    return params, g, n_frames


def _blocks(params, g, n_frames, **kw):
    return list(
        vocode_streaming(
            params, TINY_CONFIG, g, n_frames, rng=jax.random.PRNGKey(1), **kw
        )
    )


def test_emission_covers_exact_total(encoded):
    params, g, n_frames = encoded
    total = int(np.asarray(n_frames)[0]) * TINY_CONFIG.samples_per_frame
    blocks = _blocks(params, g, n_frames, block_frames=24)
    assert sum(b.shape[1] for b in blocks) == total


@pytest.mark.parametrize("first", [8, 16, 24])
def test_first_block_sizing(encoded, first):
    params, g, n_frames = encoded
    total = int(np.asarray(n_frames)[0]) * TINY_CONFIG.samples_per_frame
    blocks = _blocks(
        params, g, n_frames, block_frames=24, first_block_frames=first
    )
    expect_first = min(first * TINY_CONFIG.samples_per_frame, total)
    assert blocks[0].shape[1] == expect_first
    assert sum(b.shape[1] for b in blocks) == total


def test_i16_wire_equivalent_within_quantization(encoded):
    params, g, n_frames = encoded
    f32 = np.concatenate(
        [b[0] for b in _blocks(params, g, n_frames, block_frames=24)]
    )
    i16 = np.concatenate(
        [b[0] for b in _blocks(params, g, n_frames, block_frames=24,
                               wire="i16")]
    )
    assert i16.dtype == np.float32  # reconstructed host-side
    scale = np.abs(f32).max() + 1e-9
    # clipping at ±1 aside, differences are one PCM quantization step
    mask = np.abs(f32) < 1.0
    assert np.abs(i16[mask] - f32[mask]).max() <= (1.0 / 32767) * 1.01 + 0.0
    assert scale > 0


def test_wire_helpers_roundtrip():
    import jax.numpy as jnp

    x = jnp.asarray(np.linspace(-1.2, 1.2, 101, dtype=np.float32)[None])
    wired = _wire(x, True)
    assert wired.dtype == jnp.int16
    back = _unwire(np.asarray(wired))
    assert back.dtype == np.float32
    assert np.abs(back).max() <= 1.0  # clipped
    assert _wire(x, False) is x
    same = _unwire(np.asarray(x))
    np.testing.assert_array_equal(same, np.asarray(x))


def test_tiny_bucket_falls_back_to_single_render(encoded):
    params, g, n_frames = encoded
    # block larger than the whole frame bucket triggers the fallback
    blocks = _blocks(params, g, n_frames, block_frames=4 * TINY_CONFIG.max_frames)
    assert len(blocks) == 1
    total = int(np.asarray(n_frames)[0]) * TINY_CONFIG.samples_per_frame
    assert blocks[0].shape[1] == total


def test_batch_rows_emitted_together(encoded):
    params, g, n_frames = encoded
    blocks = _blocks(params, g, n_frames, block_frames=24)
    for b in blocks:
        assert b.ndim == 2 and b.shape[0] == 1
