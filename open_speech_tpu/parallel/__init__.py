"""Device mesh / sharding layer (no reference counterpart — SURVEY §2.8)."""

from open_speech_tpu.parallel.mesh import (
    build_mesh,
    whisper_param_sharding,
    shard_params,
)

__all__ = ["build_mesh", "whisper_param_sharding", "shard_params"]
