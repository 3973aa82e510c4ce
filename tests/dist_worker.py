"""Subprocess body for the 2-process jax.distributed integration test.

Run as `python tests/dist_worker.py` with OS_DIST_* env set by the parent
(tests/test_distributed_integration.py). Each process initializes the real
multi-process runtime through the production entry point
(parallel.distributed.maybe_init_distributed — no mocks), then proves the
DCN path works: a psum over every global device must see contributions
from BOTH processes. Prints a machine-checkable line the parent asserts on.
"""

import os
import sys

# keep the worker light and deterministic: CPU backend, 2 local devices
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

from open_speech_tpu.parallel.distributed import maybe_init_distributed


def main() -> None:
    assert maybe_init_distributed(), "OS_DIST_* env not picked up"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    # cross-process reduction: each process contributes (its index + 1), so
    # a correct global sum is 1 + 2 = 3 — impossible to fake locally
    mine = jnp.array([float(jax.process_index() + 1)])
    gathered = multihost_utils.process_allgather(mine)
    total = float(np.asarray(gathered).sum())

    # and a psum through a compiled program over the global mesh
    from functools import partial

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.full((2,), float(jax.process_index() + 1), np.float32),
        (4,),
    )

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
    def global_sum(x):
        return jax.lax.psum(x.sum(), "dp")

    psum_total = float(global_sum(ones))
    print(
        f"DIST_OK pid={jax.process_index()} allgather={total} psum={psum_total}",
        flush=True,
    )


if __name__ == "__main__":
    main()
    sys.exit(0)
