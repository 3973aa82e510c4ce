"""Studio endpoints end-to-end: profiles, history, conversations, composer."""

import asyncio
import uuid

import numpy as np
import pytest

from aiohttp.test_utils import TestClient, TestServer

from open_speech_tpu.ops import audio as codec


def client_test(coro_fn):
    from open_speech_tpu.server.app import create_app

    async def runner():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)

    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        runner()
    )


def _name() -> str:
    return f"p-{uuid.uuid4().hex[:8]}"


# ── profiles ──────────────────────────────────────────────────────────


def test_profile_crud_cycle():
    async def body(client):
        name = _name()
        resp = await client.post(
            "/api/profiles",
            json={"name": name, "backend": "kokoro", "voice": "af_sky",
                  "speed": 1.3},
        )
        assert resp.status == 201
        profile = await resp.json()
        assert profile["name"] == name
        assert profile["speed"] == 1.3
        pid = profile["id"]

        # duplicate name -> 409
        resp = await client.post(
            "/api/profiles",
            json={"name": name, "backend": "kokoro", "voice": "af_sky"},
        )
        assert resp.status == 409

        # update
        resp = await client.put(
            f"/api/profiles/{pid}",
            json={"name": name, "backend": "kokoro", "voice": "af_heart",
                  "speed": 0.9},
        )
        assert (await resp.json())["voice"] == "af_heart"

        # set default
        resp = await client.post(f"/api/profiles/{pid}/default")
        data = await resp.json()
        assert data["default_profile_id"] == pid

        # delete
        resp = await client.delete(f"/api/profiles/{pid}")
        assert resp.status == 204
        resp = await client.get(f"/api/profiles/{pid}")
        assert resp.status == 404

    client_test(body)


def test_profile_missing_fields():
    async def body(client):
        resp = await client.post("/api/profiles", json={"name": "x"})
        assert resp.status == 422

    client_test(body)


# ── history ───────────────────────────────────────────────────────────


def test_history_filter_and_delete():
    async def body(client):
        from open_speech_tpu.server.app import history_manager

        eid = history_manager.log_stt("m1", "a.wav", "hello")
        history_manager.log_tts("kokoro", "af_heart", 1.0, "wav", "hi",
                                None, 100, streamed=False)
        resp = await client.get("/api/history?type=stt&limit=5")
        data = await resp.json()
        assert all(i["type"] == "stt" for i in data["items"])
        resp = await client.delete(f"/api/history/{eid}")
        assert resp.status == 204
        resp = await client.delete(f"/api/history/{eid}")
        assert resp.status == 404

    client_test(body)


# ── conversations (with real kokoro synth for render) ────────────────


def test_conversation_lifecycle_and_render():
    async def body(client):
        resp = await client.post(
            "/api/conversations",
            json={
                "name": "demo",
                "turns": [{"speaker": "A", "text": "Hello there."}],
            },
        )
        assert resp.status == 201
        conv = await resp.json()
        cid = conv["id"]
        assert len(conv["turns"]) == 1

        resp = await client.post(
            f"/api/conversations/{cid}/turns",
            json={"speaker": "B", "text": "Hi back."},
        )
        assert resp.status == 201
        turn2 = await resp.json()
        assert turn2["turn_index"] == 1

        # render (real kokoro backend, 2 turns + 500ms gap)
        resp = await client.post(
            f"/api/conversations/{cid}/render", json={"format": "wav"}
        )
        assert resp.status == 200, await resp.text()
        render = await resp.json()
        assert render["turn_count"] == 2
        assert render["duration_ms"] > 500

        resp = await client.get(f"/api/conversations/{cid}/audio")
        assert resp.status == 200
        wav = await resp.read()
        audio, sr = codec.read_wav(wav)
        assert sr == 24000 and len(audio) > 0

        # delete turn reindexes
        resp = await client.delete(
            f"/api/conversations/{cid}/turns/{conv['turns'][0]['id']}"
        )
        assert resp.status == 204
        data = await (await client.get(f"/api/conversations/{cid}")).json()
        assert data["turns"][0]["turn_index"] == 0

        resp = await client.delete(f"/api/conversations/{cid}")
        assert resp.status == 204

    client_test(body)


def test_render_empty_conversation_400():
    async def body(client):
        resp = await client.post("/api/conversations", json={"name": "empty"})
        cid = (await resp.json())["id"]
        resp = await client.post(
            f"/api/conversations/{cid}/render", json={}
        )
        assert resp.status == 400
        await client.delete(f"/api/conversations/{cid}")

    client_test(body)


# ── composer ──────────────────────────────────────────────────────────


def test_composer_render_and_mix(tmp_path):
    from open_speech_tpu.config import settings

    # place sources inside an allowed root (the conversations dir)
    import os
    from pathlib import Path

    src_dir = Path(settings.os_conversations_dir)
    src_dir.mkdir(parents=True, exist_ok=True)
    t = np.arange(24000) / 24000
    a = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    b = (0.3 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    (src_dir / "trk_a.wav").write_bytes(codec.write_wav(a, 24000))
    (src_dir / "trk_b.wav").write_bytes(codec.write_wav(b, 24000))

    async def body(client):
        resp = await client.post(
            "/api/composer/render",
            json={
                "format": "wav",
                "tracks": [
                    {"source_path": str(src_dir / "trk_a.wav"), "volume": 0.5},
                    {
                        "source_path": str(src_dir / "trk_b.wav"),
                        "offset_s": 0.5,
                    },
                ],
            },
        )
        assert resp.status == 200, await resp.text()
        render = await resp.json()
        assert render["duration_ms"] == 1500  # 1s + 0.5s offset
        cid = render["composition_id"]

        resp = await client.get(f"/api/composer/render/{cid}/audio")
        assert resp.status == 200
        audio, sr = codec.read_wav(await resp.read())
        assert len(audio) == 36000

        resp = await client.get("/api/composer/renders")
        assert any(
            r["id"] == cid for r in (await resp.json())["items"]
        )
        resp = await client.delete(f"/api/composer/render/{cid}")
        assert resp.status == 204

    client_test(body)


def test_composer_mute_solo_and_path_guard():
    async def body(client):
        # path outside allowed roots -> 403
        resp = await client.post(
            "/api/composer/render",
            json={"tracks": [{"source_path": "/etc/passwd"}]},
        )
        assert resp.status == 403
        # all muted -> 400
        resp = await client.post(
            "/api/composer/render",
            json={"tracks": [{"source_path": "x.wav", "muted": True}]},
        )
        assert resp.status == 400

    client_test(body)
