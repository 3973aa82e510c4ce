"""Security middleware (reference: src/middleware.py) on aiohttp.

Same semantics: constant-time bearer/query API-key auth with exempt paths,
per-IP token-bucket rate limiting with X-RateLimit headers and probabilistic
cleanup, X-Forwarded-For honored only behind OS_TRUST_PROXY, WebSocket
key/origin checks done in the endpoints (the middleware skips upgrades).
"""

from __future__ import annotations

import hmac
import logging
import random
import time

from aiohttp import web

from open_speech_tpu.config import settings

logger = logging.getLogger(__name__)

AUTH_EXEMPT_PATHS = frozenset(
    {"/health", "/docs", "/openapi.json", "/redoc", "/web"}
)


def _is_auth_exempt(path: str) -> bool:
    if path in AUTH_EXEMPT_PATHS:
        return True
    return path.startswith("/web/") or path.startswith("/static/")


def _key_ok(provided: str | None) -> bool:
    return bool(provided) and hmac.compare_digest(provided, settings.stt_api_key)


def check_api_key(request: web.Request) -> bool:
    """True when auth passes (or is disabled / path exempt)."""
    if not settings.stt_api_key:
        return True
    if _is_auth_exempt(request.path):
        return True
    auth_header = request.headers.get("authorization", "")
    if auth_header.startswith("Bearer ") and _key_ok(auth_header[7:].strip()):
        return True
    query_key = request.query.get("api_key")
    if query_key and _key_ok(query_key):
        logger.warning(
            "API key in query string is deprecated — use Authorization: Bearer"
        )
        return True
    return False


def verify_ws_api_key(request: web.Request) -> bool:
    """WS handshake key check (reference: src/middleware.py:74-95)."""
    if not settings.stt_api_key:
        return True
    query_key = request.query.get("api_key")
    if query_key and _key_ok(query_key):
        logger.warning(
            "API key in query string is deprecated — use Authorization: Bearer"
        )
        return True
    auth_header = request.headers.get("authorization", "")
    return auth_header.startswith("Bearer ") and _key_ok(auth_header[7:].strip())


def _allowed_ws_origins() -> set[str]:
    raw = settings.os_ws_allowed_origins.strip()
    if not raw:
        return set()
    return {o.strip() for o in raw.split(",") if o.strip()}


def verify_ws_origin(request: web.Request) -> bool:
    allowed = _allowed_ws_origins()
    if not allowed:
        return True
    return request.headers.get("origin", "") in allowed


class RateLimiter:
    """Token bucket per IP (reference: src/middleware.py:117-175)."""

    def __init__(self, requests_per_minute: int, burst: int | None = None):
        self.rate = requests_per_minute / 60.0
        self.burst = burst or requests_per_minute
        self._buckets: dict[str, tuple[float, float]] = {}

    def _client_ip(self, request: web.Request) -> str:
        if settings.stt_trust_proxy:
            forwarded = request.headers.get("x-forwarded-for")
            if forwarded:
                return forwarded.split(",")[0].strip()
        return request.remote or "unknown"

    def check(self, request: web.Request) -> tuple[bool, dict[str, str]]:
        ip = self._client_ip(request)
        now = time.monotonic()
        if ip in self._buckets:
            tokens, last_time = self._buckets[ip]
            tokens = min(self.burst, tokens + (now - last_time) * self.rate)
        else:
            tokens = float(self.burst)
        headers = {
            "X-RateLimit-Limit": str(self.burst),
            "X-RateLimit-Remaining": str(max(0, int(tokens) - 1)),
        }
        if tokens >= 1.0:
            self._buckets[ip] = (tokens - 1.0, now)
            allowed = True
        else:
            self._buckets[ip] = (tokens, now)
            headers["Retry-After"] = str(int((1.0 - tokens) / self.rate) + 1)
            headers["X-RateLimit-Remaining"] = "0"
            allowed = False
        if random.random() < 0.01:
            self.cleanup()
        return allowed, headers

    def cleanup(self, max_age: float = 3600.0) -> None:
        now = time.monotonic()
        for ip in [
            ip for ip, (_, t) in self._buckets.items() if now - t > max_age
        ]:
            del self._buckets[ip]


_rate_limiter: RateLimiter | None = None


def get_rate_limiter() -> RateLimiter | None:
    global _rate_limiter
    if settings.stt_rate_limit <= 0:
        return None
    if _rate_limiter is None:
        _rate_limiter = RateLimiter(
            requests_per_minute=settings.stt_rate_limit,
            burst=settings.stt_rate_limit_burst or settings.stt_rate_limit,
        )
    return _rate_limiter


def reset_rate_limiter() -> None:
    """Test hook: re-read rate-limit settings."""
    global _rate_limiter
    _rate_limiter = None


def cors_headers(_request=None) -> dict[str, str]:
    """Public alias for error responses (see server/errors.py)."""
    return _cors_headers()


def _cors_headers() -> dict[str, str]:
    origins = settings.os_cors_origins
    return {
        "Access-Control-Allow-Origin": origins if origins else "*",
        "Access-Control-Allow-Methods": "*",
        "Access-Control-Allow-Headers": "*",
    }


@web.middleware
async def security_middleware(request: web.Request, handler):
    """auth -> rate limit -> handler, error envelope on failures."""
    if request.headers.get("upgrade", "").lower() == "websocket":
        return await handler(request)

    if request.method == "OPTIONS":  # CORS preflight
        return web.Response(status=204, headers=_cors_headers())

    if not check_api_key(request):
        return web.json_response(
            {
                "error": {
                    "message": (
                        "Invalid or missing API key. Set Authorization: "
                        "Bearer <key> header."
                    )
                }
            },
            status=401,
            headers=_cors_headers(),
        )

    rl_headers: dict[str, str] = {}
    limiter = get_rate_limiter()
    if limiter and not _is_auth_exempt(request.path):
        allowed, rl_headers = limiter.check(request)
        if not allowed:
            return web.json_response(
                {"error": {"message": "Rate limit exceeded. Try again later."}},
                status=429,
                headers={**rl_headers, **_cors_headers()},
            )

    response = await handler(request)
    for k, v in {**rl_headers, **_cors_headers()}.items():
        if k not in response.headers:
            response.headers[k] = v
    return response
