"""Sharding rules for inputs, params and optimizer state.

ZeRO analogue (role of DeepSpeed zero stage 2, reference ds_config.json:1-24):
params stay replicated (they are read every step by every device), while the
Adam moments — the 2x params of optimizer state — are sharded across the
'data' axis. GSPMD then emits reduce-scatter/all-gather around the update,
which is exactly the ZeRO-2 communication schedule, but derived by the
compiler instead of hand-written buckets.

Spatial input sharding puts lat/lon of the physical fields on the 'lat'/'lon'
mesh axes (sequence parallelism; SURVEY §5.7).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec(ndim: int) -> P:
    """Fields are (B, ..., lat, lon): batch on 'data', trailing two dims on
    'lat'/'lon'."""
    middle = (None,) * (ndim - 3)
    return P("data", *middle, "lat", "lon")


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a Batch (or any pytree of (B, ..., lat, lon) arrays)."""
    from pangu_tpu.parallel.mesh import valid_spec

    def put(x):
        x = np.asarray(x)
        spec = valid_spec(mesh, batch_spec(x.ndim), x.shape)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate parameters across the mesh."""
    return jax.device_put(params, NamedSharding(mesh, P()))


def _zero_spec(shape, data_size: int) -> P:
    """Shard the largest 'data'-divisible dim; replicate if none exists."""
    if not shape or data_size <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % data_size == 0 and shape[i] >= data_size:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def zero_shard_opt_state(opt_state: Any, mesh: Mesh, enable: bool = True) -> Any:
    """Shard optimizer-state leaves along the 'data' axis (ZeRO)."""
    data_size = mesh.shape.get("data", 1)

    def put(x):
        if not hasattr(x, "shape"):
            return x
        spec = _zero_spec(x.shape, data_size) if enable else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, opt_state)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))
