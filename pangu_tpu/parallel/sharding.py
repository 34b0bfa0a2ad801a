"""Sharding rules for inputs, params and optimizer state.

ZeRO analogue (role of DeepSpeed zero stage 2, reference ds_config.json:1-24):
params stay replicated (they are read every step by every device); the Adam
moments — 2x params of optimizer state — live sharded across the 'data' axis
(`zero_shard_opt_state`), and gradients are constrained to the same sharding
inside the train step (`zero_constraint`). GSPMD then emits exactly the
ZeRO-2 communication schedule — reduce-scatter the gradients, update each
param shard locally, all-gather the updated params — derived by the compiler
instead of hand-written buckets. Disable `zero_gradients` for ZeRO-1-style
(opt-state-only) sharding; per-device memory for both modes is reported by
`zero_bytes_per_device`.

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


def zero_constraint(tree: Any, enable: bool = True) -> Any:
    """Constrain a pytree (gradients) to the ZeRO data-axis sharding inside
    a jitted computation. Reads the active mesh at trace time; no-op when
    unmeshed, single-data-axis, or disabled."""
    from pangu_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or not enable:
        return tree
    data_size = mesh.shape.get("data", 1)
    if data_size <= 1:
        return tree

    def constrain(x):
        if not hasattr(x, "shape"):
            return x
        spec = _zero_spec(x.shape, data_size)
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(constrain, tree)


def replicate_constraint(tree: Any, enable: bool = True) -> Any:
    """Constrain a pytree to full replication inside a jitted computation —
    the all-gather-params tail of the ZeRO-2 schedule."""
    from pangu_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or not enable:
        return tree
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())) if hasattr(x, "shape") else x,
        tree,
    )


def zero_bytes_per_device(tree: Any, mesh: Mesh, enable: bool = True) -> int:
    """Per-device bytes of a tree under the ZeRO sharding rule (the memory
    math behind the zero_opt_state / zero_gradients knobs)."""
    data_size = mesh.shape.get("data", 1) if enable else 1

    def leaf_bytes(x) -> int:
        if not hasattr(x, "shape"):
            return 0
        n = int(np.prod(x.shape)) if x.shape else 1
        itemsize = np.dtype(x.dtype).itemsize
        spec = _zero_spec(x.shape, data_size) if enable else P()
        shard = data_size if any(s == "data" for s in spec) else 1
        return n * itemsize // shard

    return sum(leaf_bytes(x) for x in jax.tree.leaves(tree))
