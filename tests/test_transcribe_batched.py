"""Batched long-form transcription (models/whisper/batched.py)."""

import numpy as np
import pytest

import jax

from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    init_params,
)
from open_speech_tpu.models.whisper.batched import (
    _split_all_segments,
    chunk_boundaries,
    quietness_curve,
    transcribe_batched,
)
from open_speech_tpu.models.whisper.transcribe import (
    TranscribeOptions,
    transcribe,
)
from open_speech_tpu.ops.mel import HOP_LENGTH, SAMPLE_RATE

CFG = PRESETS["test-tiny"]
WINDOW_SAMPLES = CFG.n_audio_ctx * 2 * HOP_LENGTH  # 1.2 s for test-tiny


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
    logprob_threshold=None,
    compression_ratio_threshold=None,
    no_speech_threshold=None,
)


# ── chunk boundary selection ─────────────────────────────────────────


def test_chunks_cover_file_and_respect_window():
    n = int(10.7 * SAMPLE_RATE)
    w = 3 * SAMPLE_RATE
    chunks = chunk_boundaries(n, w, None)
    assert chunks[0][0] == 0
    assert chunks[-1][1] == n
    for (s0, e0), (s1, _) in zip(chunks, chunks[1:]):
        assert e0 == s1  # contiguous
    assert all(e - s <= w for s, e in chunks)
    assert all((e - s) % HOP_LENGTH == 0 for s, e in chunks[:-1])


def test_cut_snaps_to_quiet_gap():
    # 6 s file, 3 s window, loud everywhere except a dip at 2.5 s
    sr = SAMPLE_RATE
    audio = np.ones(6 * sr, np.float32) * 0.5
    audio[int(2.4 * sr) : int(2.6 * sr)] = 0.001
    curve = quietness_curve(audio)
    chunks = chunk_boundaries(len(audio), 3 * sr, curve, snap_s=1.0)
    cut = chunks[0][1]
    assert int(2.4 * sr) <= cut <= int(2.7 * sr)  # landed in the dip


def test_no_curve_uses_fixed_grid():
    n, w = 10 * SAMPLE_RATE, 3 * SAMPLE_RATE
    chunks = chunk_boundaries(n, w, None)
    assert chunks[0] == (0, w)
    assert chunks[1] == (w, 2 * w)


def test_min_chunk_floor():
    # dip right at the start must not produce a degenerate tiny chunk
    sr = SAMPLE_RATE
    audio = np.ones(8 * sr, np.float32) * 0.5
    audio[: int(0.2 * sr)] = 0.0
    curve = quietness_curve(audio)
    chunks = chunk_boundaries(len(audio), 3 * sr, curve, snap_s=10.0)
    assert chunks[0][1] - chunks[0][0] >= int(1.5 * sr)


# ── tail-keeping segment splitter ────────────────────────────────────


class _FakeSpecial:
    eot = 100
    timestamp_begin = 110


class _FakeTok:
    special = _FakeSpecial()

    def decode(self, toks):
        return " ".join(str(t) for t in toks)


def test_split_all_keeps_trailing_tokens():
    # <|0.00|> a b <|0.40|> <|0.40|> c d  -> 2 segments, tail kept
    toks = [110, 1, 2, 130, 130, 3, 4]
    segs = _split_all_segments(toks, _FakeTok(), 0.0, 100)
    assert len(segs) == 2
    assert segs[0][0] == [1, 2]
    assert segs[1][0] == [3, 4]
    assert segs[1][1] == pytest.approx(0.4)
    assert segs[1][2] == pytest.approx(1.0)  # window end (100 frames)


def test_split_all_offsets():
    toks = [110, 5, 120]
    segs = _split_all_segments(toks, _FakeTok(), 30.0, 100)
    assert len(segs) == 1
    assert segs[0][1] == pytest.approx(30.0)
    assert segs[0][2] == pytest.approx(30.2)


def test_split_all_clamps_to_chunk_duration():
    """Timestamps pointing into a snapped chunk's silence padding clamp to
    the chunk's real duration — no overlap with the next chunk's start."""
    # chunk is 50 frames = 0.5 s, but the model emitted <|0.90|> (tok 155)
    toks = [110, 5, 155, 155, 6, 155]
    segs = _split_all_segments(toks, _FakeTok(), 10.0, 50)
    for _, start, end in segs:
        assert 10.0 <= start <= 10.5
        assert start <= end <= 10.5


# ── end-to-end on the tiny random model ──────────────────────────────


def test_single_window_delegates_to_sequential(setup):
    params, tok = setup
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.1, 0.1, SAMPLE_RATE).astype(np.float32)  # 1 s
    seq_segs, seq_info = transcribe(params, CFG, tok, audio, OPTS)
    bat_segs, bat_info = transcribe_batched(params, CFG, tok, audio, OPTS)
    assert bat_info == seq_info
    assert [(s.text, s.start, s.end) for s in bat_segs] == [
        (s.text, s.start, s.end) for s in seq_segs
    ]


def test_multi_window_batched(setup):
    params, tok = setup
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.1, 0.1, int(3.1 * SAMPLE_RATE)).astype(np.float32)
    segs, info = transcribe_batched(params, CFG, tok, audio, OPTS)
    assert info.duration == pytest.approx(3.1, abs=0.01)
    assert segs, "random-weight decode should emit something"
    for s in segs:
        assert 0.0 <= s.start <= s.end <= 3.1 + 1.3
    assert [s.id for s in segs] == list(range(len(segs)))
    # chunks were actually batched: seeks span multiple windows
    assert len({s.seek for s in segs}) >= 2


def test_bucket_padding_is_inert(setup):
    """Ladder padding must not change real rows: 3 rows padded to the
    bucket-of-4 program equal the same program fed 4 explicit rows."""
    import jax.numpy as jnp

    from open_speech_tpu.models.whisper.batched import (
        _decode_rows_with_fallback,
    )
    from open_speech_tpu.models.whisper.model import encode
    from open_speech_tpu.ops.mel import log_mel_spectrogram

    params, tok = setup
    rng = np.random.default_rng(2)
    block = rng.uniform(-0.1, 0.1, (4, WINDOW_SAMPLES)).astype(np.float32)
    block[3] = block[0]  # explicit copy row == what padding inserts
    mel = log_mel_spectrogram(jnp.asarray(block), n_mels=CFG.n_mels)
    enc = encode(params, mel, CFG)
    prompt = np.asarray(
        [tok.special.sot_sequence("en", "transcribe", timestamps=True)],
        np.int32,
    )
    rows3 = _decode_rows_with_fallback(params, CFG, tok, enc[:3], prompt, OPTS)
    rows4 = _decode_rows_with_fallback(params, CFG, tok, enc, prompt, OPTS)
    for a, b in zip(rows3, rows4[:3]):
        assert a["tokens"] == b["tokens"]
        assert a["avg_logprob"] == pytest.approx(b["avg_logprob"])


def test_backend_routes_longform_to_batched(monkeypatch):
    """OS_STT_BATCHED_LONGFORM=1 sends >2-window uploads down the batched
    path; short clips and sampled requests stay sequential."""
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings
    from open_speech_tpu.models.whisper import batched as batched_mod
    from open_speech_tpu.ops import audio as codec

    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    monkeypatch.setattr(settings, "os_stt_batched_longform", True)
    monkeypatch.setattr(settings, "os_stt_batch_windows", 4)

    calls = []
    real = batched_mod.transcribe_batched

    def spy(*args, **kwargs):
        calls.append(kwargs.get("max_batch"))
        return real(*args, **kwargs)

    monkeypatch.setattr(batched_mod, "transcribe_batched", spy)

    backend = JaxWhisperBackend()
    backend.load_model("test-tiny")
    rng = np.random.default_rng(0)
    long_wav = codec.write_wav(
        rng.uniform(-0.1, 0.1, 4 * SAMPLE_RATE).astype(np.float32), 16000
    )
    short_wav = codec.write_wav(
        rng.uniform(-0.1, 0.1, SAMPLE_RATE).astype(np.float32), 16000
    )
    backend.transcribe(
        long_wav, "test-tiny", language="en", beam_size=1, fallback=False
    )
    assert calls == [4]
    backend.transcribe(
        short_wav, "test-tiny", language="en", beam_size=1, fallback=False
    )
    assert calls == [4]  # short clip: sequential path
    backend.transcribe(
        long_wav, "test-tiny", language="en", beam_size=1,
        temperature=0.7, fallback=False,
    )
    assert calls == [4]  # sampled request: sequential path
    backend.transcribe(
        long_wav, "test-tiny", language="en", beam_size=1, fallback=False,
        prompt="style hint",
    )
    # prompted upload rides the batched path too: its prefix is padded to
    # the ONE canonical BATCHED_PREV_LEN shape the warmup covers
    assert calls == [4, 4]


def test_initial_prompt_conditions_chunks(setup):
    """initial_prompt must reach the batched prompt rows, padded/trimmed
    to the single canonical BATCHED_PREV_LEN shape."""
    params, tok = setup
    rng = np.random.default_rng(4)
    audio = rng.uniform(-0.1, 0.1, int(3.0 * SAMPLE_RATE)).astype(np.float32)
    from dataclasses import replace

    opts = replace(OPTS, initial_prompt="hello context")
    segs, info = transcribe_batched(params, CFG, tok, audio, opts)
    assert info.duration == pytest.approx(3.0, abs=0.01)  # ran end-to-end


def test_initial_prompt_prefix_is_canonical_shape(setup, monkeypatch):
    """Every prompted batched decode sees exactly [startofprev] +
    BATCHED_PREV_LEN tokens + sot, regardless of the prompt's length —
    short hints pad with space tokens, long ones keep the newest tail."""
    from open_speech_tpu.models.whisper import batched as B

    params, tok = setup
    sp = tok.special
    seen = []
    real = B._decode_rows_with_fallback

    def spy(p, cfg, t, enc, prompt, opts, **kw):
        seen.append(np.asarray(prompt)[0].tolist())
        return real(p, cfg, t, enc, prompt, opts, **kw)

    monkeypatch.setattr(B, "_decode_rows_with_fallback", spy)
    rng = np.random.default_rng(5)
    audio = rng.uniform(-0.1, 0.1, int(3.0 * SAMPLE_RATE)).astype(np.float32)
    from dataclasses import replace

    fb = min(B.BATCHED_PREV_LEN, CFG.n_text_ctx // 2 - 1)
    for hint in ("hi", "a much longer style hint " * 20):
        seen.clear()
        opts = replace(OPTS, initial_prompt=hint)
        transcribe_batched(params, CFG, tok, audio, opts)
        sot = list(sp.sot_sequence("en", OPTS.task, timestamps=OPTS.timestamps))
        for row in seen:
            assert row[0] == sp.startofprev
            assert len(row) == 1 + fb + len(sot)
            assert row[1 + fb:] == sot


def test_fallback_temperature_recorded(setup):
    params, tok = setup
    rng = np.random.default_rng(3)
    audio = rng.uniform(-0.1, 0.1, int(3.0 * SAMPLE_RATE)).astype(np.float32)
    # impossible logprob gate: every temperature fails, last one is kept
    opts = TranscribeOptions(
        language="en",
        beam_size=1,
        temperature=(0.0, 1.0),
        max_new_tokens=8,
        logprob_threshold=1.0,  # avg_logprob is always < 1.0
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    segs, _ = transcribe_batched(params, CFG, tok, audio, opts)
    assert segs
    assert all(s.temperature == 1.0 for s in segs)


def test_detect_language_pcm_returns_code(monkeypatch):
    """Backend helper used by streaming/realtime language pinning: runs
    the warmed detect program over (up to) one window of raw PCM and
    returns a language code string."""
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    backend = JaxWhisperBackend()
    backend.load_model("test-tiny")
    rng = np.random.default_rng(0)
    pcm = rng.uniform(-0.2, 0.2, int(1.5 * SAMPLE_RATE)).astype(np.float32)
    code = backend.detect_language_pcm("test-tiny", pcm)
    assert isinstance(code, str) and code
    tok = backend._models["test-tiny"]["tok"]
    assert tok.special.lang_token(code) is not None
