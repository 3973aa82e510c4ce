"""``python -m open_speech_tpu.server`` — start the speech server
(reference: src/main.py:1410-1426 uvicorn runner; here aiohttp)."""

import os

# Pin the platform BEFORE anything imports jax-touching modules: TPU plugins
# may override JAX_PLATFORMS at interpreter start, and backend selection is
# frozen at first backend use.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from open_speech_tpu.server.app import main  # noqa: E402

main()
