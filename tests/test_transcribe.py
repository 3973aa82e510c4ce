"""Transcription loop + formatter output schema (random-weight model)."""

import numpy as np
import pytest

import jax

from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    init_params,
)
from open_speech_tpu.models.whisper.transcribe import (
    TranscribeOptions,
    build_response,
    transcribe,
)
from open_speech_tpu.text import formatters

CFG = PRESETS["test-tiny"]


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tok = FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)
    return params, tok


OPTS = TranscribeOptions(
    language="en",
    beam_size=1,
    temperature=(0.0,),
    max_new_tokens=8,
    # random weights produce low-logprob gibberish; don't trigger fallback
    logprob_threshold=None,
    compression_ratio_threshold=None,
    no_speech_threshold=None,
)


def test_transcribe_short_audio(setup):
    params, tok = setup
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.1, 0.1, 16000).astype(np.float32)  # 1 s
    segments, info = transcribe(params, CFG, tok, audio, OPTS)
    assert info.duration == 1.0
    assert info.language == "en"
    for s in segments:
        assert s.start >= 0 and s.end >= s.start
        assert isinstance(s.text, str)


def test_transcribe_window_advance(setup):
    """Audio longer than one 0.6 s test window must advance the seek loop."""
    params, tok = setup
    # test-tiny has n_audio_ctx=60 -> window = 60*2 frames = 1.2 s of audio
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.1, 0.1, int(16000 * 2.5)).astype(np.float32)
    segments, info = transcribe(params, CFG, tok, audio, OPTS)
    assert info.duration == 2.5  # duration reflects the full file


def test_build_response_verbose_json(setup):
    params, tok = setup
    audio = np.zeros(8000, np.float32)
    segments, info = transcribe(params, CFG, tok, audio, OPTS)
    resp = build_response(segments, info, "transcribe", "verbose_json")
    assert resp["task"] == "transcribe"
    assert resp["language"] == "en"
    assert "duration" in resp and "text" in resp
    for seg in resp["segments"]:
        assert set(seg) == {
            "id", "seek", "start", "end", "text", "tokens", "temperature",
            "avg_logprob", "compression_ratio", "no_speech_prob",
        }


def test_build_response_formats(setup):
    params, tok = setup
    audio = np.zeros(8000, np.float32)
    segments, info = transcribe(params, CFG, tok, audio, OPTS)
    assert build_response(segments, info, "transcribe", "json").keys() == {"text"}
    srt = build_response(segments, info, "transcribe", "srt")
    assert srt["raw_text"] is True
    vtt = build_response(segments, info, "transcribe", "vtt")
    assert vtt["text"].startswith("WEBVTT")


# ── formatter parity (pure functions) ─────────────────────────────────


def test_srt_formatting():
    result = {
        "segments": [
            {"start": 0.0, "end": 2.5, "text": " Hello world"},
            {"start": 2.5, "end": 5.0, "text": " Second line"},
        ]
    }
    srt = formatters.format_as_srt(result)
    assert srt.split("\n")[0] == "1"
    assert "00:00:00,000 --> 00:00:02,500" in srt
    assert "Hello world" in srt
    assert "\n2\n" in srt


def test_srt_no_segments_fallback():
    srt = formatters.format_as_srt({"text": "hi", "duration": 1.25})
    assert srt == "1\n00:00:00,000 --> 00:00:01,250\nhi\n"
    assert formatters.format_as_srt({"text": ""}) == ""


def test_vtt_formatting():
    result = {"segments": [{"start": 61.5, "end": 65.0, "text": "x"}]}
    vtt = formatters.format_as_vtt(result)
    assert vtt.startswith("WEBVTT\n\n")
    assert "00:01:01.500 --> 00:01:05.000" in vtt
    assert formatters.format_as_vtt({"text": ""}) == "WEBVTT\n"


def test_format_transcription_dispatch():
    res = {"text": " hi "}
    content, ctype = formatters.format_transcription(res, "text")
    assert (content, ctype) == ("hi", "text/plain")
    content, ctype = formatters.format_transcription(res, "json")
    assert (content, ctype) == ("", "application/json")
    _, ctype = formatters.format_transcription(res, "vtt")
    assert ctype == "text/vtt"


def test_timestamp_truncation():
    # reference truncates rather than rounds
    assert formatters._fmt_time_srt(1.9999) == "00:00:01,999"
    assert formatters._fmt_time_vtt(3600 + 60 + 1.5) == "01:01:01.500"


def test_multi_window_covers_full_duration(setup):
    """Audio longer than one window produces segments from every window and
    a correct duration (reference seek loop: src/backends/faster_whisper.py
    delegates to CT2's internal 30s windows)."""
    params, tok = setup
    window_s = CFG.n_audio_ctx * 2 * 160 / 16000
    rng = np.random.default_rng(3)
    audio = (rng.uniform(-0.3, 0.3, int(16000 * window_s * 2.5))).astype(np.float32)
    opts = TranscribeOptions(
        language="en", temperature=(0.0,), beam_size=1,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=8,
    )
    segments, info = transcribe(params, CFG, tok, audio, opts)
    assert abs(info.duration - window_s * 2.5) < 0.1
    # seek advanced through all windows: last segment starts in the last one
    assert segments, "random weights with no-speech gate off must emit text"
    assert segments[-1].seek >= CFG.n_audio_ctx * 2  # beyond first window


def test_no_speech_gate_skips_windows(setup):
    params, tok = setup
    audio = np.zeros(16000, np.float32)
    opts = TranscribeOptions(
        language="en", temperature=(0.0,), beam_size=1,
        no_speech_threshold=1e-9, logprob_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=8,
    )
    # threshold ~0 means every window "is silence" -> no segments
    segments, info = transcribe(params, CFG, tok, audio, opts)
    assert segments == []
    assert info.duration == 1.0


def test_initial_prompt_conditions_decode(setup):
    params, tok = setup
    audio = np.random.default_rng(4).uniform(-0.3, 0.3, 16000).astype(np.float32)
    base = TranscribeOptions(
        language="en", temperature=(0.0,), beam_size=1,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=8,
    )
    import dataclasses
    primed = dataclasses.replace(base, initial_prompt="hello world")
    seg_a, _ = transcribe(params, CFG, tok, audio, base)
    seg_b, _ = transcribe(params, CFG, tok, audio, primed)
    # both decode; the prompt reaches the model (text may or may not differ
    # with random weights, but the call path must not error)
    assert isinstance(seg_a, list) and isinstance(seg_b, list)


def test_bucket_prev_bounds_prompt_shapes():
    from open_speech_tpu.models.whisper.transcribe import _bucket_prev

    room = 223
    lengths = set()
    for n in range(0, 400, 7):
        out = _bucket_prev(list(range(n)), room)
        lengths.add(len(out))
        if out:
            assert out[-1] == min(n, 400) - 1 or out[-1] == n - 1  # newest kept
    assert lengths <= {0, 4, 8, 16, 32, 64, 128, room}  # bounded compile set
    # conditioning keeps the most recent tokens; short segments (>=4 tokens)
    # still condition the next window (reference conditions on whatever
    # exists — round-2 review fix)
    assert _bucket_prev([1, 2, 3], room) == []  # < smallest bucket
    assert _bucket_prev([1, 2, 3, 4, 5, 6, 7, 8], room) == [1, 2, 3, 4, 5, 6, 7, 8]
    assert _bucket_prev(list(range(40)), room) == list(range(8, 40))  # last 32
