"""PiperBatcher: row independence and backend wiring.

Contract (runtime/tts_batcher.PiperBatcher): a VITS job batched with
concurrent peers produces the same PCM as the same job synthesized
alone — per-row seeded noise (fold_in) plus the model's per-row masking
make the batch transparent. Replaces the reference's
one-onnxruntime-call-per-thread piper path
(src/tts/backends/piper_backend.py:296).
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

import jax

from open_speech_tpu.models.piper.model import PiperConfig, init_piper_params
from open_speech_tpu.runtime.tts_batcher import PiperBatcher, _piper_rows


@pytest.fixture(scope="module")
def piper():
    cfg = PiperConfig(
        hidden=32,
        ffn_filter=64,
        n_layers=2,
        dp_filter=32,
        flow_layers=2,
        upsample_rates=(4, 4),
        upsample_kernels=(8, 8),
        upsample_initial=64,
        resblock_kernels=(3,),
        resblock_dilations=((1, 3),),
        max_phonemes=16,
        max_frames=64,
    )
    params = init_piper_params(jax.random.PRNGKey(3), cfg)
    return params, cfg


def _solo(params, cfg, ids, speaker=0, speed=1.0, seed=0):
    import jax.numpy as jnp

    phon = np.zeros((1, cfg.max_phonemes), np.int32)
    phon[0, : len(ids)] = ids
    audio, n_frames = _piper_rows(
        params, cfg,
        jnp.asarray(phon), jnp.asarray([len(ids)], jnp.int32),
        jnp.asarray([speaker], jnp.int32), jnp.asarray([speed], jnp.float32),
        jnp.asarray([seed], jnp.uint32),
    )
    return np.asarray(
        audio[0, : int(n_frames[0]) * cfg.samples_per_frame], np.float32
    )


def test_batched_rows_match_solo(piper):
    params, cfg = piper
    b = PiperBatcher(params, cfg)
    try:
        jobs = [
            ([1, 2, 3, 4, 5], 0, 1.0, 0),
            ([6, 7, 8], 0, 1.25, 7),
            ([9, 10, 11, 12], 0, 0.8, 42),
        ]
        refs = [_solo(params, cfg, *j) for j in jobs]
        results: list[np.ndarray | None] = [None] * len(jobs)
        errs: list[Exception] = []

        def run(i):
            try:
                chunks = list(b.synthesize(*jobs[i]))
                results[i] = (
                    np.concatenate(chunks) if chunks
                    else np.zeros((0,), np.float32)
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=run, args=(i,)) for i in range(len(jobs))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errs, errs
        for got, ref in zip(results, refs):
            assert got is not None and got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
    finally:
        b.stop()


def test_noise_is_per_seed_not_per_slot(piper):
    """The same job gets identical audio regardless of batch position."""
    params, cfg = piper
    a = _solo(params, cfg, [1, 2, 3], seed=5)
    b = _solo(params, cfg, [1, 2, 3], seed=5)
    c = _solo(params, cfg, [1, 2, 3], seed=6)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a[: len(c)], c[: len(a)])


def test_backend_batcher_toggle_equivalence(tmp_path, monkeypatch):
    """piper backend output is identical with the batcher on and off."""
    from open_speech_tpu.config import settings
    from open_speech_tpu.tts.backends.piper_jax import PiperBackend

    be = PiperBackend()
    be.load_model("piper/en_US-lessac-low")
    text = "Hello there."
    monkeypatch.setattr(settings, "os_tts_batcher_enabled", False)
    off = np.concatenate(list(be.synthesize(text, "piper/en_US-lessac-low")))
    monkeypatch.setattr(settings, "os_tts_batcher_enabled", True)
    on = np.concatenate(list(be.synthesize(text, "piper/en_US-lessac-low")))
    np.testing.assert_allclose(on, off, atol=3e-5, rtol=1e-4)
    be.unload_model("piper/en_US-lessac-low")  # releases the batcher


def test_stop_fails_pending(piper):
    params, cfg = piper
    b = PiperBatcher(params, cfg)
    list(b.synthesize([1, 2], 0, 1.0, 0))
    b.stop()
    with pytest.raises(RuntimeError):
        list(b.synthesize([1, 2], 0, 1.0, 0))
