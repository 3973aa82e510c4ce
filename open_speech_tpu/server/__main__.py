"""``python -m open_speech_tpu.server`` — start the speech server
(reference: src/main.py:1410-1426 uvicorn runner; here aiohttp)."""

import os

# Pin the platform BEFORE anything imports jax-touching modules: TPU plugins
# may override JAX_PLATFORMS at interpreter start, and backend selection is
# frozen at first backend use. The host CPU backend is ALWAYS kept in the
# list: control-path work (the VAD singleton) runs there, and an env like
# JAX_PLATFORMS=axon would otherwise silently push per-chunk VAD through
# the accelerator relay (a round trip per 100 ms chunk of every session).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    _parts = [
        p.strip() for p in os.environ["JAX_PLATFORMS"].split(",") if p.strip()
    ]
    if "cpu" not in _parts:
        _parts.append("cpu")
    jax.config.update("jax_platforms", ",".join(_parts))

from open_speech_tpu.server.app import main  # noqa: E402

main()
