"""Unit tests for host-side codecs (WAV, PCM, G.711)."""

import struct

import numpy as np
import pytest

from open_speech_tpu.ops import audio as A


def test_pcm16_roundtrip():
    x = np.linspace(-1.0, 1.0, 1000).astype(np.float32) * 0.9
    data = A.float_to_pcm16(x)
    y = A.pcm16_to_float(data)
    assert np.max(np.abs(x - y)) < 1.0 / 16000


def test_float_to_pcm16_clips():
    x = np.array([2.0, -2.0, 0.0], dtype=np.float32)
    ints = np.frombuffer(A.float_to_pcm16(x), dtype="<i2")
    assert ints[0] == 32767 and ints[1] == -32767 and ints[2] == 0


def test_wav_header_layout():
    h = A.wav_header(1000, 16000, 1, 16)
    assert len(h) == 44
    assert h[:4] == b"RIFF" and h[8:12] == b"WAVE"
    assert h[12:16] == b"fmt " and h[36:40] == b"data"
    assert int.from_bytes(h[24:28], "little") == 16000  # sample rate
    assert int.from_bytes(h[40:44], "little") == 1000  # data size
    assert int.from_bytes(h[4:8], "little") == 1036  # riff size


def test_wav_roundtrip_mono():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, 4000).astype(np.float32)
    wav = A.write_wav(x, 16000)
    y, sr = A.read_wav(wav)
    assert sr == 16000
    assert y.shape == x.shape
    assert np.max(np.abs(x - y)) < 1.0 / 16000


def test_wav_stereo_downmix():
    t = np.arange(800) / 16000
    left = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    right = -left
    interleaved = np.stack([left, right], axis=1)
    wav = A.write_wav(interleaved, 16000)
    y, sr = A.read_wav(wav)
    assert y.shape == (800,)
    assert np.max(np.abs(y)) < 1e-3  # L+R cancel


def test_wav_extra_chunks_tolerated():
    x = np.zeros(100, dtype=np.float32)
    wav = bytearray(A.write_wav(x, 8000))
    # splice a LIST chunk between fmt and data
    list_chunk = b"LIST" + (8).to_bytes(4, "little") + b"INFOIART"
    wav2 = bytes(wav[:36]) + list_chunk + bytes(wav[36:])
    # fix riff size
    wav2 = (
        wav2[:4]
        + (len(wav2) - 8).to_bytes(4, "little")
        + wav2[8:]
    )
    y, sr = A.read_wav(wav2)
    assert sr == 8000 and y.shape == (100,)


def test_wav_24bit():
    import struct

    ints = np.array([0, 1 << 22, -(1 << 22)], dtype=np.int64)
    raw = b"".join(struct.pack("<i", int(v) << 8)[1:4] for v in ints)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    y, sr = A.read_wav(hdr + raw)
    assert np.allclose(y, [0.0, 0.5, -0.5], atol=1e-6)


def test_ulaw_roundtrip_monotone():
    pcm = np.linspace(-32768, 32767, 2000).astype(np.int16)
    codes = A.ulaw_encode(pcm)
    decoded = A.ulaw_decode(codes)
    # companding error bounded by segment size (~ 1/16 of magnitude)
    err = np.abs(decoded.astype(np.int32) - pcm.astype(np.int32))
    tol = np.maximum(np.abs(pcm.astype(np.int32)) / 12, 600)
    assert np.all(err <= tol)


def test_ulaw_known_values():
    # G.711: code 0xFF decodes to 0, sign bit flips polarity
    assert A.ulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0
    assert A.ulaw_decode(np.array([0x7F], dtype=np.uint8))[0] == 0
    pos = A.ulaw_decode(np.array([0x80], dtype=np.uint8))[0]
    neg = A.ulaw_decode(np.array([0x00], dtype=np.uint8))[0]
    assert pos == -neg and abs(int(pos)) > 30000  # extreme segment


def test_alaw_roundtrip():
    pcm = np.linspace(-30000, 30000, 1500).astype(np.int16)
    decoded = A.alaw_decode(A.alaw_encode(pcm))
    err = np.abs(decoded.astype(np.int32) - pcm.astype(np.int32))
    tol = np.maximum(np.abs(pcm.astype(np.int32)) / 10, 600)
    assert np.all(err <= tol)


def test_read_wav_truncated_extensible_header_raises_valueerror():
    """A fmt chunk claiming WAVE_FORMAT_EXTENSIBLE size 40 but truncated
    before the sub-format must surface as ValueError (the documented bad-
    input signal), never struct.error — read_wav is called directly on
    user uploads (backends/jax_whisper, diarization)."""
    bad = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 40) + struct.pack("<H", 0xFFFE)
    )
    with pytest.raises(ValueError):
        A.read_wav(bad)


def test_read_wav_odd_length_truncated_data_chunk():
    """A cut-short PCM16 stream with an odd usable byte count decodes the
    usable prefix instead of crashing in np.frombuffer."""
    pcm = (np.arange(10, dtype=np.int16) * 1000).tobytes()
    wav = A.wav_header(len(pcm), 16000) + pcm
    y, sr = A.read_wav(wav[:-3])  # drop 1.5 samples
    assert sr == 16000 and len(y) == 8


def test_g711_bit_exact_vs_audioop():
    """ITU-T segment encoders/decoders must match audioop (Sun g711.c)
    exhaustively over all 65536 samples / 256 codes (wire parity with
    real G.711 peers, e.g. twilio telephony streams)."""
    audioop = pytest.importorskip("audioop")  # removed in py3.13
    s = np.arange(-32768, 32768, dtype=np.int16)
    assert A.ulaw_encode(s).tobytes() == audioop.lin2ulaw(s.tobytes(), 2)
    assert A.alaw_encode(s).tobytes() == audioop.lin2alaw(s.tobytes(), 2)
    codes = np.arange(256, dtype=np.uint8)
    assert A.ulaw_decode(codes).tobytes() == audioop.ulaw2lin(
        codes.tobytes(), 2
    )
    assert A.alaw_decode(codes).tobytes() == audioop.alaw2lin(
        codes.tobytes(), 2
    )


def test_linear_resample_pcm16_length_and_dc():
    pcm = (np.ones(1600, dtype=np.int16) * 1000).tobytes()
    out = A.linear_resample_pcm16(pcm, 16000, 8000)
    arr = np.frombuffer(out, dtype="<i2")
    assert len(arr) == 800
    assert np.all(np.abs(arr.astype(np.int32) - 1000) <= 1)


def test_wav_ulaw_payload():
    import struct

    pcm = np.linspace(-20000, 20000, 400).astype(np.int16)
    codes = A.ulaw_encode(pcm).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
    hdr += b"data" + struct.pack("<I", len(codes))
    y, sr = A.read_wav(hdr + codes)
    assert sr == 8000 and y.shape == (400,)
    assert np.corrcoef(y, pcm.astype(np.float32))[0, 1] > 0.999
