"""Security middleware units: auth, WS checks, rate limiting, CORS.

Behavioral parity with the reference's middleware suite
(reference: tests/test_security.py; src/middleware.py).
"""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer, make_mocked_request

from open_speech_tpu.config import settings
from open_speech_tpu.server import middleware as mw


def req(path="/v1/models", headers=None, remote="1.2.3.4", method="GET"):
    r = make_mocked_request(method, path, headers=headers or {})
    r._transport_peername = (remote, 1234)
    return r


@pytest.fixture
def keyed(monkeypatch):
    monkeypatch.setattr(settings, "os_api_key", "sekrit")
    yield


# ── API-key auth ─────────────────────────────────────────────────────


def test_auth_disabled_when_no_key():
    assert mw.check_api_key(req())


def test_bearer_header_accepted(keyed):
    assert mw.check_api_key(req(headers={"Authorization": "Bearer sekrit"}))


def test_bearer_wrong_key_rejected(keyed):
    assert not mw.check_api_key(req(headers={"Authorization": "Bearer nope"}))


def test_bearer_prefix_required(keyed):
    assert not mw.check_api_key(req(headers={"Authorization": "sekrit"}))
    assert not mw.check_api_key(req(headers={"Authorization": "Basic sekrit"}))


def test_missing_header_rejected(keyed):
    assert not mw.check_api_key(req())


def test_query_key_accepted_with_warning(keyed, caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="open_speech_tpu.server.middleware"):
        assert mw.check_api_key(req(path="/v1/models?api_key=sekrit"))
    assert any("deprecated" in r.message for r in caplog.records)


def test_query_key_wrong_rejected(keyed):
    assert not mw.check_api_key(req(path="/v1/models?api_key=wrong"))


@pytest.mark.parametrize(
    "path", ["/health", "/web", "/web/index.html", "/static/app.js", "/docs"]
)
def test_exempt_paths_pass_without_key(keyed, path):
    assert mw.check_api_key(req(path=path))


def test_nonexempt_paths_require_key(keyed):
    for path in ["/v1/models", "/api/models", "/v1/audio/speech"]:
        assert not mw.check_api_key(req(path=path))


# ── WebSocket handshake checks ───────────────────────────────────────


def test_ws_key_via_query(keyed):
    assert mw.verify_ws_api_key(req(path="/v1/audio/stream?api_key=sekrit"))
    assert not mw.verify_ws_api_key(req(path="/v1/audio/stream?api_key=no"))


def test_ws_key_via_bearer(keyed):
    assert mw.verify_ws_api_key(
        req(path="/v1/audio/stream", headers={"Authorization": "Bearer sekrit"})
    )


def test_ws_key_disabled():
    assert mw.verify_ws_api_key(req(path="/v1/audio/stream"))


def test_ws_origin_open_by_default():
    assert mw.verify_ws_origin(req(headers={"Origin": "http://evil.example"}))


def test_ws_origin_allowlist(monkeypatch):
    monkeypatch.setattr(
        settings, "os_ws_allowed_origins", "http://a.example, http://b.example"
    )
    assert mw.verify_ws_origin(req(headers={"Origin": "http://a.example"}))
    assert mw.verify_ws_origin(req(headers={"Origin": "http://b.example"}))
    assert not mw.verify_ws_origin(req(headers={"Origin": "http://c.example"}))
    assert not mw.verify_ws_origin(req())  # no Origin header


# ── Rate limiter ─────────────────────────────────────────────────────


def test_burst_then_429_headers():
    rl = mw.RateLimiter(requests_per_minute=60, burst=2)
    ok1, h1 = rl.check(req())
    ok2, h2 = rl.check(req())
    ok3, h3 = rl.check(req())
    assert (ok1, ok2, ok3) == (True, True, False)
    assert h1["X-RateLimit-Limit"] == "2"
    assert int(h1["X-RateLimit-Remaining"]) > int(h2["X-RateLimit-Remaining"])
    assert h3["X-RateLimit-Remaining"] == "0"
    assert int(h3["Retry-After"]) >= 1


def test_refill_over_time(monkeypatch):
    rl = mw.RateLimiter(requests_per_minute=60, burst=1)
    t = [1000.0]
    monkeypatch.setattr(mw.time, "monotonic", lambda: t[0])
    assert rl.check(req())[0]
    assert not rl.check(req())[0]
    t[0] += 1.1  # 60/min -> one token per second
    assert rl.check(req())[0]


def test_per_ip_isolation():
    rl = mw.RateLimiter(requests_per_minute=60, burst=1)
    assert rl.check(req(remote="10.0.0.1"))[0]
    assert not rl.check(req(remote="10.0.0.1"))[0]
    assert rl.check(req(remote="10.0.0.2"))[0]


def test_forwarded_for_requires_trust_proxy(monkeypatch):
    rl = mw.RateLimiter(requests_per_minute=60, burst=1)
    fwd = {"X-Forwarded-For": "9.9.9.9, 8.8.8.8"}
    assert rl._client_ip(req(headers=fwd)) == "1.2.3.4"  # untrusted: peer IP
    monkeypatch.setattr(settings, "os_trust_proxy", True)
    assert rl._client_ip(req(headers=fwd)) == "9.9.9.9"  # first hop


def test_cleanup_drops_stale_buckets(monkeypatch):
    rl = mw.RateLimiter(requests_per_minute=60, burst=1)
    t = [1000.0]
    monkeypatch.setattr(mw.time, "monotonic", lambda: t[0])
    rl.check(req(remote="10.0.0.1"))
    t[0] += 10.0
    rl.check(req(remote="10.0.0.2"))
    t[0] += 3595.0  # 10.0.0.1 is now >1h stale, 10.0.0.2 is not
    rl.cleanup()
    assert "10.0.0.1" not in rl._buckets
    assert "10.0.0.2" in rl._buckets


def test_rate_limiter_disabled_when_zero(monkeypatch):
    monkeypatch.setattr(settings, "os_rate_limit", 0)
    mw.reset_rate_limiter()
    assert mw.get_rate_limiter() is None
    mw.reset_rate_limiter()


# ── Middleware end-to-end over a live aiohttp app ────────────────────


def _mini_test(coro_fn):
    from aiohttp import web

    async def ok(request):
        return web.json_response({"ok": True})

    async def runner():
        app = web.Application(middlewares=[mw.security_middleware])
        app.router.add_get("/v1/models", ok)
        app.router.add_get("/health", ok)
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)

    loop = asyncio.get_event_loop_policy().new_event_loop()
    try:
        return loop.run_until_complete(runner())
    finally:
        loop.close()


def test_envelope_on_401(monkeypatch):
    monkeypatch.setattr(settings, "os_api_key", "sekrit")

    async def body(client):
        resp = await client.get("/v1/models")
        assert resp.status == 401
        payload = await resp.json()
        assert "message" in payload["error"]
        assert resp.headers["Access-Control-Allow-Origin"] == "*"

    _mini_test(body)


def test_preflight_204():
    async def body(client):
        resp = await client.options("/v1/models")
        assert resp.status == 204
        assert resp.headers["Access-Control-Allow-Methods"] == "*"

    _mini_test(body)


def test_rate_headers_attached(monkeypatch):
    monkeypatch.setattr(settings, "os_rate_limit", 100)
    monkeypatch.setattr(settings, "os_rate_limit_burst", 100)
    mw.reset_rate_limiter()

    async def body(client):
        resp = await client.get("/v1/models")
        assert resp.status == 200
        assert "X-RateLimit-Remaining" in resp.headers
        # exempt paths skip the limiter entirely
        resp = await client.get("/health")
        assert "X-RateLimit-Remaining" not in resp.headers

    try:
        _mini_test(body)
    finally:
        mw.reset_rate_limiter()
