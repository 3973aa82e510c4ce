"""Preprocessing, postprocessing (batch + streaming), effects, ingest, encode."""

import numpy as np
import pytest

from open_speech_tpu.audio import effects, encode, ingest, postprocessing, preprocessing
from open_speech_tpu.ops import audio as codec


# ── preprocessing ─────────────────────────────────────────────────────


def test_normalize_gain_to_target():
    audio = np.ones(1000, np.float32) * 0.01
    out = preprocessing.normalize_gain(audio, target_dbfs=-18.0)
    rms = np.sqrt(np.mean(out**2))
    assert abs(20 * np.log10(rms) - (-18.0)) < 0.1


def test_normalize_gain_silence_passthrough():
    silence = np.zeros(100, np.float32)
    assert np.array_equal(preprocessing.normalize_gain(silence), silence)


def test_preprocess_roundtrip_wav():
    audio = (np.sin(np.linspace(0, 20, 4000)) * 0.05).astype(np.float32)
    wav = codec.write_wav(audio, 16000)
    out = preprocessing.preprocess_stt_audio(wav, noise_reduce=False, normalize=True)
    decoded, sr = codec.read_wav(out)
    assert sr == 16000
    out_rms = np.sqrt(np.mean(decoded**2))
    assert abs(20 * np.log10(out_rms) - (-18.0)) < 0.5


def test_preprocess_non_wav_passthrough():
    junk = b"definitely not audio"
    assert (
        preprocessing.preprocess_stt_audio(junk, noise_reduce=False, normalize=True)
        == junk
    )


# ── postprocessing ────────────────────────────────────────────────────


def test_trim_silence():
    audio = np.concatenate(
        [np.zeros(100), np.ones(50) * 0.5, np.zeros(100)]
    ).astype(np.float32)
    out = postprocessing.trim_silence(audio)
    assert len(out) == 50


def test_trim_all_silence_passthrough():
    silence = np.zeros(100, np.float32)
    assert len(postprocessing.trim_silence(silence)) == 100


def test_normalize_output_peak():
    audio = np.ones(10, np.float32) * 0.5
    out = postprocessing.normalize_output(audio)
    assert np.max(np.abs(out)) == pytest.approx(0.95)


def test_process_tts_chunks_collapses():
    chunks = iter([np.zeros(100, np.float32), np.ones(50, np.float32) * 0.5])
    out = list(postprocessing.process_tts_chunks(chunks))
    assert len(out) == 1
    assert len(out[0]) == 50  # leading silence trimmed
    assert np.max(out[0]) == pytest.approx(0.95)


def test_streaming_postprocessor_preserves_chunks():
    pp = postprocessing.StreamingPostProcessor()
    out = []
    out += pp.feed(np.zeros(100, np.float32))  # leading silence: dropped
    out += pp.feed(np.ones(50, np.float32) * 0.5)  # speech
    out += pp.feed(np.ones(50, np.float32) * 0.25)  # more speech
    out += pp.feed(np.zeros(80, np.float32))  # candidate trailing silence
    out += pp.finish()
    total = np.concatenate(out)
    assert len(total) == 100  # leading + trailing silence gone
    assert np.max(np.abs(total)) == pytest.approx(0.95)
    assert len(out) >= 2  # stayed chunked, not collapsed


def test_streaming_postprocessor_mid_silence_kept():
    pp = postprocessing.StreamingPostProcessor()
    out = []
    out += pp.feed(np.ones(50, np.float32) * 0.5)
    out += pp.feed(np.zeros(30, np.float32))  # held
    out += pp.feed(np.ones(20, np.float32) * 0.5)  # resumes -> silence flushed
    out += pp.finish()
    assert sum(len(c) for c in out) == 100


# ── effects ───────────────────────────────────────────────────────────


SR = 16000


def _tone(freq=440.0, dur=0.5, sr=SR):
    t = np.arange(int(sr * dur)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_effects_normalize():
    out = effects.apply_chain(_tone() * 0.1, SR, [{"type": "normalize", "target_lufs": -16}])
    rms = np.sqrt(np.mean(out**2))
    assert abs(20 * np.log10(rms) - (-16)) < 0.5


def test_effects_reverb_mixes():
    x = _tone()
    out = effects.apply_chain(x, SR, [{"type": "reverb", "room": "large"}])
    assert out.shape == x.shape
    assert not np.allclose(out, x)


def test_effects_robot_ring_mod():
    x = np.ones(SR, np.float32)
    out = effects.apply_chain(x, SR, [{"type": "robot"}])
    # ring-modulated DC = the 100 Hz carrier itself
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec)  # bins are 1 Hz at 1 s
    assert abs(peak_hz - 100) <= 1


def test_effects_pitch_shift_moves_frequency():
    x = _tone(220.0, dur=1.0)
    out = effects.apply_chain(x, SR, [{"type": "pitch", "semitones": 12}])
    assert len(out) == len(x)  # duration preserved
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak = np.argmax(spec) * SR / len(out)
    assert abs(peak - 440.0) < 15  # one octave up


def test_effects_podcast_eq_kills_low_freq():
    low = _tone(30.0, dur=1.0)
    out = effects.apply_chain(low, SR, [{"type": "podcast_eq"}])
    assert np.sqrt(np.mean(out**2)) < 0.3 * np.sqrt(np.mean(low**2))


def test_effects_unknown_type_ignored():
    x = _tone()
    out = effects.apply_chain(x, SR, [{"type": "nonexistent"}])
    assert np.allclose(out, x)


def test_effects_empty_chain():
    x = _tone()
    assert np.allclose(effects.apply_chain(x, SR, None), x)


# ── ingest ────────────────────────────────────────────────────────────


def test_convert_to_wav_native_path():
    audio = _tone(440.0, 0.25, sr=44100)
    wav44 = codec.write_wav(audio, 44100)
    out = ingest.convert_to_wav(wav44)
    decoded, sr = codec.read_wav(out)
    assert sr == 16000
    assert abs(len(decoded) - int(len(audio) * 16000 / 44100)) <= 1


def test_convert_to_wav_passthrough_on_unknown():
    junk = b"\x00\x01binarydata"
    assert ingest.convert_to_wav(junk) == junk


# ── encode ────────────────────────────────────────────────────────────


def test_encode_wav_and_pcm():
    audio = _tone()
    wav = encode.encode_audio(audio, SR, "wav")
    assert codec.is_wav(wav)
    pcm = encode.encode_audio(audio, SR, "pcm")
    assert len(pcm) == len(audio) * 2


def test_encode_unsupported_format():
    with pytest.raises(ValueError):
        encode.encode_audio(_tone(), SR, "xyz")


def test_encode_compressed_requires_ffmpeg():
    if encode.ffmpeg_available():
        pytest.skip("ffmpeg present")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        encode.encode_audio(_tone(), SR, "mp3")


def test_encode_streaming_wav():
    chunks = [_tone(dur=0.1), _tone(dur=0.1)]
    out = list(encode.encode_audio_streaming(iter(chunks), SR, "wav"))
    assert out[0][:4] == b"RIFF"
    total_pcm = b"".join(out[1:])
    assert len(total_pcm) == sum(len(c) for c in chunks) * 2


def test_encode_streaming_pcm():
    chunks = [np.ones(10, np.float32) * 0.1]
    out = list(encode.encode_audio_streaming(iter(chunks), SR, "pcm"))
    assert len(out) == 1 and len(out[0]) == 20


def test_streaming_encoder_eof_sentinel_not_lost():
    """If ffmpeg exits early, read_available consuming the EOF sentinel
    must not make finish() block forever (encode.py review fix)."""
    import queue

    enc = encode.StreamingFFmpegEncoder.__new__(encode.StreamingFFmpegEncoder)
    enc._out = queue.Queue()
    enc._eof = False

    class _Proc:
        class _Stdin:
            @staticmethod
            def close():
                pass

        stdin = _Stdin()

        @staticmethod
        def wait(timeout=None):
            return 0

        @staticmethod
        def poll():
            return 0

    enc._proc = _Proc()
    enc._out.put(b"x")
    enc._out.put(None)  # early EOF: ffmpeg died
    assert enc.read_available() == [b"x"]
    assert enc.read_available() == []
    assert list(enc.finish()) == []  # must not block


def test_streaming_postprocessor_all_silent_matches_batch():
    from open_speech_tpu.audio.postprocessing import (
        StreamingPostProcessor,
        normalize_output,
        trim_silence,
    )

    chunks = [np.full(100, 0.005, np.float32) for _ in range(3)]
    sp = StreamingPostProcessor()
    outs = []
    for c in chunks:
        outs.extend(sp.feed(c))
    outs.extend(sp.finish())
    batch = normalize_output(trim_silence(np.concatenate(chunks)))
    got = np.concatenate(outs) if outs else np.zeros(0, np.float32)
    assert got.shape == batch.shape
    np.testing.assert_allclose(got, batch, atol=1e-6)


def test_convert_to_wav_truncated_extensible_header_passthrough():
    import struct as _struct

    from open_speech_tpu.audio.ingest import convert_to_wav

    bad = (
        b"RIFF" + _struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 40) + _struct.pack("<H", 0xFFFE)
    )
    assert convert_to_wav(bad) == bad
