"""Parameter checkpointing with orbax (no reference counterpart).

The reference is inference-only ("checkpointing" = HF weight caches, SURVEY
§5). With train.py in the picture, fine-tuned params need durable save/
restore; orbax handles sharded arrays transparently, so checkpoints written
from a multi-chip mesh restore on any topology.
"""

from __future__ import annotations

import logging
from pathlib import Path

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def save_params(path: str | Path, params) -> None:
    """Write a parameter pytree checkpoint (overwrites)."""
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    logger.info("Saved checkpoint to %s", path)


def load_params(path: str | Path, like=None):
    """Restore a parameter pytree; ``like`` provides structure/sharding."""
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
