"""Autoregressive forecasting primitives.

The production inference unit: one jitted *forecast step* mapping physical
fields at t to physical fields at t+horizon (forward + de-normalization,
reference inference/inference_multiOutput.py:171-197 feedback loop), plus a
``lax.scan`` rollout that keeps the entire trajectory on device with donated
buffers — the TPU-native replacement for the reference's ONNX-session loop.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from pangu_tpu.aux import AuxConstants, norm_back_data
from pangu_tpu.model import PanguModel


@functools.lru_cache(maxsize=8)
def make_forecast_step(model: PanguModel, donate: bool = True) -> Callable:
    """(params, upper, surface, aux) -> (upper', surface') in physical units.

    Cached per (model, donate): every ModelBundle over the same architecture
    shares one jitted program instead of recompiling (flax Modules are frozen
    dataclasses, so they hash by configuration). Each cached entry pins a
    compiled executable for the cache's lifetime; the bound covers the
    largest real workload (4-model mix24 bundles) with room to spare while
    letting abandoned configs be evicted."""

    def step(params, upper, surface, aux: AuxConstants):
        ou, os_ = model.apply(params, upper, surface, aux, True)
        return norm_back_data(ou, os_, aux)

    return jax.jit(step, donate_argnums=(1, 2) if donate else ())


@functools.lru_cache(maxsize=8)
def _rollout_program(model: PanguModel, steps: int,
                     keep_trajectory: bool) -> Callable:
    """Cached jitted scan (same bounded-cache pattern as make_forecast_step
    — an inline @jax.jit would re-trace and recompile the steps-long scan
    on EVERY call, minutes per init time at full geometry). aux is an
    argument: closed over, its full-geometry arrays would inline as HLO
    constants."""

    def run(params, upper, surface, aux: AuxConstants):
        def body(carry, _):
            u, s = carry
            ou, os_ = model.apply(params, u, s, aux, True)
            ou, os_ = norm_back_data(ou, os_, aux)
            out = (ou, os_) if keep_trajectory else ()
            return (ou, os_), out

        carry, traj = jax.lax.scan(body, (upper, surface), length=steps)
        return carry, traj

    return jax.jit(run)


def rollout_scan(
    model: PanguModel,
    params,
    upper: jnp.ndarray,
    surface: jnp.ndarray,
    aux: AuxConstants,
    steps: int,
    keep_trajectory: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``steps`` autoregressive steps in one compiled scan.

    Returns stacked (steps, ...) trajectories when ``keep_trajectory``; else
    just the final fields. For long rollouts where every frame must be scored
    on host, prefer the ``make_forecast_step`` loop to overlap transfer.
    """
    run = _rollout_program(model, steps, keep_trajectory)
    (fu, fs), traj = run(params, upper, surface, aux)
    if keep_trajectory:
        return traj
    return fu, fs
