"""Multi-host launch: jax.distributed init + DP-replica serving topology.

The reference is strictly single-process (SURVEY §2.8/§5: no comm backend
of any kind); this is the TPU-native addition SURVEY §5 names: "DP replicas
across hosts over DCN with the HTTP layer load-balancing sessions".

Serving topology (one pod slice, H hosts x C chips):

  - ICI / within host: tensor parallelism. OS_TPU_MESH="d,m" shards the
    model over the local chips (parallel/mesh.py); GSPMD collectives ride
    ICI only. This is latency-coupled work, so it never crosses DCN.
  - DCN / across hosts: data parallelism by REPLICATION, not collectives.
    Each host runs its own `python -m open_speech_tpu.server` process over
    its local mesh and serves independently; an ordinary HTTP/WS load
    balancer spreads sessions across hosts. Inference has no cross-replica
    state, so no inter-host collective is ever on a request path.
  - jax.distributed.initialize is needed only when a SINGLE program must
    span hosts (multi-host training via train.py, or a model too large for
    one host's HBM). `maybe_init_distributed()` wires it from env.

Env (all optional — absent means single-host, zero behavior change):
  OS_DIST_COORDINATOR   host:port of process 0 (e.g. "10.0.0.2:8476")
  OS_DIST_NUM_PROCESSES total process count
  OS_DIST_PROCESS_ID    this process's index (0-based)
  OS_DIST_AUTO=1        TPU pods: call `jax.distributed.initialize()` with
                        no args — it reads the TPU metadata/env (megascale)
                        and self-configures. Explicit opt-in, because on a
                        single host a no-arg initialize would fail/hang
                        rather than no-op.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_initialized = False


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from env; no-op when not configured.

    Must run before the first touch of jax devices. Returns True when a
    multi-process runtime was (or already had been) initialized.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("OS_DIST_COORDINATOR")
    n_str = os.environ.get("OS_DIST_NUM_PROCESSES")
    pid_str = os.environ.get("OS_DIST_PROCESS_ID")
    auto = os.environ.get("OS_DIST_AUTO", "").lower() in ("1", "true", "yes")
    if not coordinator and not n_str and not auto:
        return False  # single-host serving: the common case
    import jax

    kwargs: dict = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if n_str:
        kwargs["num_processes"] = int(n_str)
    if pid_str is not None:
        kwargs["process_id"] = int(pid_str)
    # OS_DIST_AUTO with no explicit vars → no-arg initialize (TPU pod
    # metadata self-configuration)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


_warned_probe = False


def _backends_initialized() -> bool:
    """True once some code path has brought jax backends up.

    Uses jax-internal probes (there is no public "are backends up
    without initializing them" API). If a jax upgrade removes both,
    assume initialized — the real topology call is then correct, just
    loop-blocking on its very first use — and warn once so the
    regression is visible rather than silently reporting replica 0/1
    forever.
    """
    global _warned_probe
    try:
        from jax._src import xla_bridge as _xb

        try:
            return bool(_xb.backends_are_initialized())
        except AttributeError:
            return bool(getattr(_xb, "_backends", None))
    except Exception:  # noqa: BLE001
        if not _warned_probe:
            _warned_probe = True
            logger.warning(
                "jax backend-state probe unavailable (jax internals "
                "changed?); replica_info may block on first backend init"
            )
        return True


def replica_info() -> dict:
    """This process's position in the serving fleet (for /health, metrics).

    Works before/without init: a plain single-process server reports
    replica 0 of 1.

    Never *triggers* backend init: callers sit on the server's event
    loop, and a first device touch there blocks the loop for the whole
    plugin bring-up (seconds on a healthy TPU tunnel, unbounded on a
    wedged one) while holding the GIL — every route including /health
    stops answering. Until some real model load has initialized the
    backends from an executor thread, report the uninitialized shape.
    """
    try:
        import jax

        if not _backends_initialized():
            return {
                "replica": 0,
                "replica_count": 1,
                "local_devices": 0,
                "global_devices": 0,
            }
        return {
            "replica": jax.process_index(),
            "replica_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count(),
        }
    except Exception:  # noqa: BLE001 — never let health reporting throw
        return {
            "replica": 0,
            "replica_count": 1,
            "local_devices": 0,
            "global_devices": 0,
        }
