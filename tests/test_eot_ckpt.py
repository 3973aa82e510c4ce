"""EOT-trained fixture: decode lengths, no-speech gate, seek loop.

tests/fixtures/test-tiny-eot is the committed output of
tools/finetune_tiny_eot.py — a test-tiny-geometry checkpoint fine-tuned
in-container on a synthetic beep task until decodes terminate with
<|endoftext|> and silence scores high <|nospeech|>. These tests prove the
properties bench.py's EOT row depends on, end to end through the real
discovery → converter → serving path (reference gate semantics:
src/backends/faster_whisper.py:235-245 no_speech/log_prob thresholds).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from open_speech_tpu.config import settings
from open_speech_tpu.ops import audio as codec

FIXTURES = Path(__file__).parent / "fixtures"
SR = 16000
WINDOW = int(1.2 * SR)  # test-tiny geometry: 1.2 s windows


def _beeps(rng: np.random.Generator, k: int) -> np.ndarray:
    clip = rng.normal(0, 0.003, WINDOW)
    span = WINDOW // k
    for i in range(k):
        dur = int(0.15 * SR)
        t = np.arange(dur) / SR
        clip[i * span : i * span + dur] += (
            0.5 * np.sin(2 * np.pi * 440.0 * t) * np.hanning(dur)
        )
    return clip.astype(np.float32)


@pytest.fixture(scope="module")
def backend():
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend

    old = settings.stt_model_dir, settings.os_precompile_on_load
    settings.stt_model_dir = str(FIXTURES)
    settings.os_precompile_on_load = False
    try:
        b = JaxWhisperBackend()
        b.load_model("test-tiny-eot")
        yield b
    finally:
        settings.stt_model_dir, settings.os_precompile_on_load = old


def test_eot_fixture_resolves_to_test_tiny_preset():
    from open_speech_tpu.backends.jax_whisper import resolve_preset

    assert resolve_preset("test-tiny-eot") == "test-tiny"


def test_decode_stops_at_eot_and_scales_with_content(backend):
    """Token counts must be EOT-determined (far under the budget) and
    grow with the number of beeps."""
    rng = np.random.default_rng(11)
    counts = []
    for k in (1, 3):
        wav = codec.write_wav(_beeps(rng, k), SR)
        resp = backend.transcribe(
            wav, "test-tiny-eot", language="en", beam_size=1,
            fallback=False, response_format="verbose_json",
        )
        segs = resp["segments"]
        assert segs, f"beep clip (k={k}) must produce a segment"
        n_tok = sum(len(s["tokens"]) for s in segs)
        counts.append(n_tok)
        assert n_tok < 48, f"decode ran toward the budget ({n_tok} tokens)"
    assert counts[0] < counts[1], "token count should grow with content"


def test_silence_exits_via_no_speech_gate(backend):
    rng = np.random.default_rng(12)
    wav = codec.write_wav(
        rng.normal(0, 0.002, WINDOW).astype(np.float32), SR
    )
    resp = backend.transcribe(
        wav, "test-tiny-eot", language="en", beam_size=1,
        fallback=True, response_format="verbose_json",
    )
    # the gate (no_speech_prob > 0.6) marks the window silent: either no
    # segment at all or a segment flagged with high no_speech_prob
    segs = resp["segments"]
    assert not segs or all(s["no_speech_prob"] > 0.6 for s in segs)
    assert resp["text"].strip() == ""


def test_seek_loop_covers_multiwindow_file(backend):
    """A 6 s file (5 windows) transcribes window by window with
    EOT-driven lengths — the bench row's shape at test scale."""
    rng = np.random.default_rng(13)
    pieces = [
        _beeps(rng, 1),
        rng.normal(0, 0.002, WINDOW).astype(np.float32),
        _beeps(rng, 2),
        rng.normal(0, 0.002, WINDOW).astype(np.float32),
        _beeps(rng, 3),
    ]
    wav = codec.write_wav(np.concatenate(pieces), SR)
    resp = backend.transcribe(
        wav, "test-tiny-eot", language="en", beam_size=1,
        fallback=True, response_format="verbose_json",
    )
    voiced = [s for s in resp["segments"] if s["no_speech_prob"] <= 0.6]
    assert len(voiced) >= 2, "beep windows must survive the gate"
    assert all(len(s["tokens"]) < 48 for s in resp["segments"])
