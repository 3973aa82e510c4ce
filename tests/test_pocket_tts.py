"""Pocket-TTS backend: clone, design, speakers, clone endpoint e2e."""

import numpy as np
import pytest

from open_speech_tpu.ops import audio as codec
from open_speech_tpu.tts.backends.pocket_tts import SPEAKERS, PocketTTSBackend


@pytest.fixture(scope="module")
def backend():
    b = PocketTTSBackend(device="cpu")
    b.load_model()
    return b


def _ref_wav(freq=200.0) -> bytes:
    t = np.arange(16000) / 16000
    return codec.write_wav(
        (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32), 16000
    )


def test_capabilities_gate_clone_and_design(backend):
    caps = backend.capabilities
    assert caps["voice_clone"] is True
    assert caps["voice_design"] is True
    assert caps["streaming"] is True
    assert caps["speakers"] == SPEAKERS


def test_speaker_synthesis(backend):
    chunks = list(backend.synthesize("Hello there.", "pocket/alice"))
    assert len(chunks) >= 1
    assert all(c.dtype == np.float32 and c.size > 0 for c in chunks)


def test_speakers_differ(backend):
    a = np.concatenate(list(backend.synthesize("test", "pocket/alice")))
    b = np.concatenate(list(backend.synthesize("test", "pocket/bob")))
    n = min(len(a), len(b))
    assert not np.allclose(a[:n], b[:n])


def test_voice_clone_deterministic_and_cached(backend):
    ref = _ref_wav()
    before = len(backend._prompt_cache)
    a = np.concatenate(
        list(backend.synthesize("clone me", "x", reference_audio=ref))
    )
    assert len(backend._prompt_cache) == before + 1  # prompt state cached
    b = np.concatenate(
        list(backend.synthesize("clone me", "x", reference_audio=ref))
    )
    assert np.array_equal(a, b)
    # a different reference voice gives different audio
    c = np.concatenate(
        list(
            backend.synthesize(
                "clone me", "x", reference_audio=_ref_wav(freq=500.0)
            )
        )
    )
    n = min(len(a), len(c))
    assert not np.allclose(a[:n], c[:n])


def test_voice_design(backend):
    a = np.concatenate(
        list(backend.synthesize("hi", "x", voice_design="deep calm voice"))
    )
    b = np.concatenate(
        list(backend.synthesize("hi", "x", voice_design="deep calm voice"))
    )
    c = np.concatenate(
        list(backend.synthesize("hi", "x", voice_design="bright excited voice"))
    )
    assert np.array_equal(a, b)  # same description -> same voice
    n = min(len(a), len(c))
    assert not np.allclose(a[:n], c[:n])


def test_registry_and_router_pick_it_up():
    from open_speech_tpu.runtime.registry import get_known_model
    from open_speech_tpu.tts.router import TTSRouter

    assert get_known_model("pocket-tts")["provider"] == "pocket-tts"
    router = TTSRouter(device="cpu")
    assert "pocket-tts" in router.list_backends()
    caps = router.get_capabilities("pocket-tts")
    assert caps["voice_clone"] is True


def test_clone_endpoint_e2e():
    """/v1/audio/speech/clone with pocket-tts through the real app."""
    import asyncio

    from aiohttp import FormData
    from aiohttp.test_utils import TestClient, TestServer

    from open_speech_tpu.server.app import create_app

    async def body():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            form = FormData()
            form.add_field("input", "Clone this voice please.")
            form.add_field("model", "pocket-tts")
            form.add_field("response_format", "wav")
            form.add_field(
                "reference_audio", _ref_wav(), filename="ref.wav",
                content_type="audio/wav",
            )
            resp = await client.post("/v1/audio/speech/clone", data=form)
            assert resp.status == 200, await resp.text()
            wav = await resp.read()
            assert wav[:4] == b"RIFF"
            audio, sr = codec.read_wav(wav)
            assert sr == 24000 and len(audio) > 1000

            # kokoro rejects clone (no capability)
            form2 = FormData()
            form2.add_field("input", "x")
            form2.add_field("model", "kokoro")
            form2.add_field(
                "reference_audio", _ref_wav(), filename="r.wav",
                content_type="audio/wav",
            )
            resp2 = await client.post("/v1/audio/speech/clone", data=form2)
            assert resp2.status == 400
            assert "not supported" in (await resp2.json())["error"]["message"]

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(body())


def test_voice_design_endpoint_e2e():
    """/v1/audio/speech with voice_design routed to pocket-tts."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from open_speech_tpu.server.app import create_app

    async def body():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            resp = await client.post(
                "/v1/audio/speech",
                json={
                    "input": "Design a voice.",
                    "model": "pocket-tts",
                    "response_format": "wav",
                    "voice_design": "a warm narrator",
                },
            )
            assert resp.status == 200, await resp.text()
            assert (await resp.read())[:4] == b"RIFF"

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(body())


def test_pocket_bf16_generates_f32_pcm():
    """A bf16 pocket model must run end-to-end (RoPE and layer-scale
    residuals must not promote K/carries to f32 against bf16 caches) and
    the stream must still yield float32 PCM (wire contract)."""
    import jax
    import jax.numpy as jnp

    from open_speech_tpu.models.pocket.model import PocketTTS

    tts = PocketTTS.random_init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    blocks = list(tts.generate_stream("hello", block_frames=2, max_frames=4))
    assert blocks
    for b in blocks:
        assert b.dtype == np.float32
        assert np.isfinite(b).all()
