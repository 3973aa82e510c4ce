"""HTTP/WS API layer on aiohttp (FastAPI is not in this deployment)."""
