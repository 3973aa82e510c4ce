"""Error envelope helpers (reference: src/main.py:230-250).

Every error response is ``{"error": {"message": ..., "code": ...}}``.
``ApiError`` plays the role of FastAPI's HTTPException; the app-level
middleware converts it (and unexpected exceptions) into the envelope.
"""

from __future__ import annotations

import logging

from aiohttp import web

logger = logging.getLogger(__name__)


class ApiError(Exception):
    def __init__(self, status: int, message, code: str = "http_error"):
        super().__init__(message)
        self.status = status
        self.detail = message
        self.code = code


def error_response(status: int, message, code: str = "http_error") -> web.Response:
    if isinstance(message, dict):
        code = str(message.get("code") or code)
        message = str(message.get("message") or message.get("detail") or message)
    return web.json_response(
        {"error": {"message": str(message), "code": code}}, status=status
    )


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except ApiError as e:
        return _with_cors(request, error_response(e.status, e.detail, e.code))
    except web.HTTPException as e:
        if e.status >= 400:
            return _with_cors(
                request, error_response(e.status, e.reason or "error")
            )
        raise
    except Exception as e:  # noqa: BLE001
        logger.exception("Unhandled error on %s %s", request.method, request.path)
        return _with_cors(
            request, error_response(500, str(e), "internal_error")
        )


def _with_cors(request: web.Request, resp: web.Response) -> web.Response:
    """Browsers can only read an error body if the error carries CORS
    headers too (success responses get them from the security middleware,
    which this middleware wraps)."""
    try:
        from open_speech_tpu.server.middleware import cors_headers

        for k, v in cors_headers(request).items():
            resp.headers.setdefault(k, v)
    except Exception:  # noqa: BLE001 — never let CORS decoration mask errors
        pass
    return resp
