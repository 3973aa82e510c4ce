"""Mesh construction and sharding rules.

The reference is single-host/single-device with no distribution (SURVEY
§2.8); this layer is the TPU-native addition: a ``("data", "model")`` mesh
where the model axis tensor-parallelizes whisper's matmuls over ICI (heads /
mlp-hidden sharded; partial sums become XLA all-reduces via GSPMD
propagation) and the data axis carries batch for serving replicas or
training. Single-device serving uses a 1x1 mesh so nothing changes until
more chips appear.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    model: int | None = None,
    devices: list | None = None,
    platform: str | None = None,
) -> Mesh:
    """Create a ("data", "model") mesh.

    Defaults: all devices on the data axis (pure DP). OS_TPU_MESH="d,m" (via
    config) or explicit args pick a TP split. Pass ``devices`` to build over
    an explicit device list, or ``platform`` (e.g. "cpu") to pick a backend —
    useful for virtual-device dry runs while a real TPU is also attached.
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested n_devices={n_devices} but only {len(devices)} "
                f"device(s) available ({[d.platform for d in devices[:4]]}...); "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N for "
                "virtual CPU meshes"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_settings() -> Mesh:
    from open_speech_tpu.config import settings

    spec = (settings.os_tpu_mesh or "").strip()
    if spec:
        d, m = (int(x) for x in spec.split(","))
        return build_mesh(data=d, model=m)
    return build_mesh()


# ── whisper sharding rules ─────────────────────────────────────────────


def _spec_for_path(path: str) -> P:
    """Partition spec for one whisper param, keyed by its tree path.

    Layout recap (leading L axis on stacked blocks is never sharded):
      attention q/k/v: [.., d, d]   -> shard output dim (heads)  P(.., None, "model")
      attention o:     [.., d, d]   -> shard input dim           P(.., "model", None)
      mlp_in:          [.., d, 4d]  -> shard hidden              P(.., None, "model")
      mlp_out:         [.., 4d, d]  -> shard hidden              P(.., "model", None)
      embeddings/ln/conv: replicated
    """
    col_sharded = ("'q'", "'k'", "'v'", "'mlp_in'")
    row_sharded = ("'o'", "'mlp_out'")
    # int8 packs nest as ['w']['q'] (int8 matrix, same shape as w) and
    # ['w']['s'] (per-output-channel scale [1, out]): q follows the w rule;
    # s shards with the output dim for col-sharded weights, else replicates.
    if path.endswith("['w']['q']"):
        path = path[: -len("['q']")]
    elif path.endswith("['w']['s']"):
        if any(f"{k}" in path[: -len("['s']")] for k in col_sharded):
            return P(None, None, "model") if "blocks" in path else P(None, "model")
        return P()
    if path.endswith("['w']"):
        if any(f"{k}" in path for k in col_sharded):
            return P(None, None, "model") if "blocks" in path else P(None, "model")
        if any(f"{k}" in path for k in row_sharded):
            return P(None, "model", None) if "blocks" in path else P("model", None)
    if path.endswith("['b']") and any(f"{k}" in path for k in col_sharded):
        return P(None, "model") if "blocks" in path else P("model")
    return P()  # replicate


def whisper_param_sharding(params, mesh: Mesh):
    """NamedSharding pytree matching ``params`` (tensor-parallel rules)."""

    def spec(path, leaf):
        key = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _spec_for_path(key))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the whisper TP rules."""
    shardings = whisper_param_sharding(params, mesh)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
