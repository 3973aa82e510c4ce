"""Multi-host launch path: env wiring, no-op safety, replica reporting."""

import pytest

from open_speech_tpu.parallel import distributed


@pytest.fixture(autouse=True)
def _reset():
    distributed._initialized = False
    yield
    distributed._initialized = False


def test_noop_without_env(monkeypatch):
    for var in (
        "OS_DIST_COORDINATOR", "OS_DIST_NUM_PROCESSES", "OS_DIST_PROCESS_ID"
    ):
        monkeypatch.delenv(var, raising=False)
    calls = []
    monkeypatch.setattr(
        "jax.distributed.initialize", lambda **kw: calls.append(kw)
    )
    assert distributed.maybe_init_distributed() is False
    assert calls == []  # single-host serving never touches the dist runtime


def test_env_wiring(monkeypatch):
    monkeypatch.setenv("OS_DIST_COORDINATOR", "10.0.0.2:8476")
    monkeypatch.setenv("OS_DIST_NUM_PROCESSES", "4")
    monkeypatch.setenv("OS_DIST_PROCESS_ID", "2")
    calls = []
    monkeypatch.setattr(
        "jax.distributed.initialize", lambda **kw: calls.append(kw)
    )
    assert distributed.maybe_init_distributed() is True
    assert calls == [
        {
            "coordinator_address": "10.0.0.2:8476",
            "num_processes": 4,
            "process_id": 2,
        }
    ]
    # idempotent: a second call does not re-initialize
    assert distributed.maybe_init_distributed() is True
    assert len(calls) == 1


def test_replica_info_single_process():
    import jax

    jax.devices()  # backends up: report the real single-process shape
    info = distributed.replica_info()
    assert info["replica"] == 0
    assert info["replica_count"] == 1
    assert info["local_devices"] >= 1


def test_replica_info_never_initializes_backends():
    """A /api/stats or /health poll on a fresh server must not be the
    thing that brings up the device plugin: first backend init blocks
    the event loop (GIL held) for the whole plugin bring-up — minutes
    on a wedged TPU tunnel. Runs in a subprocess for a genuinely
    uninitialized jax."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax._src import xla_bridge as xb\n"
        "from open_speech_tpu.parallel.distributed import replica_info\n"
        "assert not xb.backends_are_initialized()\n"
        "info = replica_info()\n"
        "assert not xb.backends_are_initialized(), 'replica_info inited backends'\n"
        "assert info == {'replica': 0, 'replica_count': 1,"
        " 'local_devices': 0, 'global_devices': 0}, info\n"
        "jax.devices()\n"
        "assert replica_info()['local_devices'] >= 1\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_stats_route_reports_replica(monkeypatch):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from open_speech_tpu.server.app import create_app

    async def body():
        app = create_app()
        async with TestClient(TestServer(app)) as client:
            resp = await client.get("/api/stats")
            assert resp.status == 200
            data = await resp.json()
            assert data["replica"]["replica_count"] >= 1

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(body())
