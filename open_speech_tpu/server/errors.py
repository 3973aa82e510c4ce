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
        return error_response(e.status, e.detail, e.code)
    except web.HTTPException as e:
        if e.status >= 400:
            return error_response(e.status, e.reason or "error")
        raise
    except Exception as e:  # noqa: BLE001
        logger.exception("Unhandled error on %s %s", request.method, request.path)
        return error_response(500, str(e), "internal_error")
