"""Upload format handling: exotic WAV encodings, ingest conversion,
content-type mapping (reference: tests/test_file_formats.py;
src/utils/audio.py). The native WAV parser must decode every encoding the
reference accepted via ffmpeg: 8/16/24/32-bit PCM, IEEE float, G.711 µ/A-law,
multi-channel, odd sample rates.
"""

import struct

import numpy as np
import pytest

from open_speech_tpu.audio.ingest import (
    CONTENT_TYPE_SUFFIX,
    convert_to_wav,
    decode_to_float32,
)
from open_speech_tpu.ops import audio as codec


def _wav(payload: bytes, fmt: int, rate: int, bits: int, channels: int = 1) -> bytes:
    block = channels * bits // 8
    header = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(payload)),
            b"WAVE",
            b"fmt ",
            struct.pack(
                "<IHHIIHH", 16, fmt, channels, rate, rate * block, block, bits
            ),
            b"data",
            struct.pack("<I", len(payload)),
        ]
    )
    return header + payload


def _sine(n=8000, rate=16000, f=440.0):
    return (0.5 * np.sin(2 * np.pi * f * np.arange(n) / rate)).astype(np.float32)


# ── WAV encoding matrix ──────────────────────────────────────────────


def test_pcm8_unsigned():
    sig = _sine()
    payload = ((sig * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
    audio, rate = codec.read_wav(_wav(payload, fmt=1, rate=16000, bits=8))
    assert rate == 16000
    assert np.max(np.abs(audio - sig)) < 1 / 64


def test_pcm24():
    sig = _sine()
    ints = (sig * (2**23 - 1)).astype(np.int32)
    raw = ints.astype("<i4").tobytes()
    payload = b"".join(raw[i : i + 3] for i in range(0, len(raw), 4))
    audio, rate = codec.read_wav(_wav(payload, fmt=1, rate=16000, bits=24))
    assert np.max(np.abs(audio - sig)) < 1e-4


def test_pcm32():
    sig = _sine()
    payload = (sig * (2**31 - 1)).astype("<i4").tobytes()
    audio, _ = codec.read_wav(_wav(payload, fmt=1, rate=16000, bits=32))
    assert np.max(np.abs(audio - sig)) < 1e-6


def test_ieee_float():
    sig = _sine()
    audio, _ = codec.read_wav(_wav(sig.tobytes(), fmt=3, rate=16000, bits=32))
    assert np.allclose(audio, sig)


def test_mulaw_payload():
    sig = _sine()
    payload = codec.ulaw_encode((sig * 32767).astype(np.int16)).tobytes()
    audio, _ = codec.read_wav(_wav(payload, fmt=7, rate=8000, bits=8))
    # G.711 µ-law: ~38 dB SNR on speech-level signals
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((audio - sig) ** 2))
    assert snr > 30


def test_alaw_payload():
    sig = _sine()
    payload = codec.alaw_encode((sig * 32767).astype(np.int16)).tobytes()
    audio, _ = codec.read_wav(_wav(payload, fmt=6, rate=8000, bits=8))
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((audio - sig) ** 2))
    assert snr > 25


def test_stereo_downmixes_or_interleaves():
    sig = _sine()
    stereo = np.stack([sig, -sig], axis=1)  # L/R opposite phase
    payload = (stereo.reshape(-1) * 32767).astype("<i2").tobytes()
    audio, rate = codec.read_wav(_wav(payload, fmt=1, rate=44100, bits=16, channels=2))
    assert rate == 44100
    # mono result: either a downmix (cancels to ~0) or first channel
    assert audio.ndim == 1


def test_unsupported_format_tag_raises():
    with pytest.raises(ValueError):
        codec.read_wav(_wav(b"\x00" * 64, fmt=85, rate=16000, bits=16))  # mp3-in-wav


def test_truncated_header_raises():
    with pytest.raises(ValueError):
        codec.read_wav(b"RIFF\x00\x00\x00\x00WAVEfmt ")


# ── Ingest conversion ────────────────────────────────────────────────


def test_convert_resamples_8k_mulaw_to_16k():
    sig = _sine(n=4000, rate=8000)
    out = convert_to_wav(
        _wav(codec.ulaw_encode((sig * 32767).astype(np.int16)).tobytes(), 7, 8000, 8)
    )
    audio, rate = codec.read_wav(out)
    assert rate == 16000
    assert abs(len(audio) - 8000) <= 16  # 0.5 s at 16 kHz


def test_convert_wav_16k_roundtrip():
    sig = _sine()
    out = convert_to_wav(codec.write_wav(sig, 16000))
    audio, rate = codec.read_wav(out)
    assert rate == 16000
    assert np.max(np.abs(audio - sig)) < 1e-3


def test_convert_passthrough_on_unknown_bytes():
    blob = b"\x00\x01\x02 not audio at all" * 10
    assert convert_to_wav(blob) == blob


def test_decode_rejects_corrupt_wav():
    assert decode_to_float32(b"RIFF\xff\xff\xff\xffWAVEjunkjunk") is None


# ── Content-type map (reference: src/utils/audio.py:41-57) ──────────


@pytest.mark.parametrize(
    "ctype,suffix",
    [
        ("audio/wav", ".wav"),
        ("audio/mpeg", ".mp3"),
        ("audio/mp4", ".m4a"),
        ("audio/ogg", ".ogg"),
        ("audio/flac", ".flac"),
        ("audio/webm", ".webm"),
        ("video/webm", ".webm"),
    ],
)
def test_content_type_suffixes(ctype, suffix):
    assert CONTENT_TYPE_SUFFIX[ctype] == suffix


# ── Through the API surface ──────────────────────────────────────────


def test_mulaw_upload_transcribes(monkeypatch):
    """A telephony-style µ-law 8 kHz WAV upload reaches the backend as
    preprocessable audio (reference accepts these via ffmpeg ingest)."""
    import asyncio
    from unittest.mock import MagicMock

    from aiohttp.test_utils import TestClient, TestServer

    from open_speech_tpu.runtime.router import router
    from open_speech_tpu.server.app import create_app

    mock = MagicMock()
    mock.name = "jax-whisper"
    mock.transcribe.return_value = {"text": "ok"}
    mock.loaded_models.return_value = []
    mock.is_model_loaded.return_value = True
    original = router._default_backend
    router._default_backend = mock
    backends = dict(router._backends)
    for key in list(router._backends):
        router._backends[key] = mock

    sig = _sine(n=8000, rate=8000)
    body = _wav(codec.ulaw_encode((sig * 32767).astype(np.int16)).tobytes(), 7, 8000, 8)

    async def runner():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            form = {"file": body, "model": "whisper-tiny"}
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200
            assert (await resp.json())["text"] == "ok"

    loop = asyncio.get_event_loop_policy().new_event_loop()
    try:
        loop.run_until_complete(runner())
    finally:
        loop.close()
        router._default_backend = original
        router._backends.update(backends)
    # backend received valid 16 kHz WAV bytes
    sent = mock.transcribe.call_args
    wav_arg = sent.kwargs.get("audio") or sent.args[0]
    assert codec.is_wav(wav_arg)
