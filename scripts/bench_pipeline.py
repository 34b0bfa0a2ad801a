"""Relative throughput of the parallelism layouts on a virtual CPU mesh.

Measures steps/s at EQUAL GLOBAL BATCH for:
  * DP          — data=8
  * DP x SP     — data=2, lat=2, lon=2
  * PP x DP     — pipe=4, data=2 (GPipe, M microbatches)

on the 8-device virtual CPU platform (no pod needed). CPU numbers say
nothing about ICI bandwidth; what they DO expose is schedule overhead —
the GPipe bubble fraction (S-1)/(M+S-1) and the cost of the switch/ppermute
machinery vs plain SPMD — which is the comparison docs/PARITY.md cites.

Usage: python scripts/bench_pipeline.py [--steps 6] [--microbatches 2]
       [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--microbatches", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    from pangu_tpu.parallel.mesh import ensure_virtual_devices

    ensure_virtual_devices(args.devices, allow_replace_backend=True)

    import jax
    import numpy as np

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import ParallelConfig, pangu_tiny
    from pangu_tpu.model import PanguModel
    from pangu_tpu.parallel import (
        activate_mesh, make_mesh, shard_batch, shard_params,
        zero_shard_opt_state,
    )
    from pangu_tpu.parallel.pipeline import NUM_STAGES, PanguPipeline
    from pangu_tpu.train.step import Batch, make_optimizer, make_train_step
    from pangu_tpu.train.trainer import TrainState, init_train_state

    cfg = pangu_tiny(drop_path_max=0.0)
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(0)
    B = args.batch
    upper = rng.standard_normal(
        (B, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (B, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    batch = Batch(upper, surface, upper + 0.1, surface + 0.1)

    results = {}

    def timed_loop(fn, state, batch_, aux_, rng_key=None):
        # warmup/compile
        state, loss = (fn(state, batch_, aux_, rng_key)
                       if rng_key is not None else fn(state, batch_, aux_))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = (fn(state, batch_, aux_, rng_key)
                           if rng_key is not None else fn(state, batch_, aux_))
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / args.steps

    def spmd_case(name, pcfg):
        c = cfg.replace(parallel=pcfg)
        mesh = make_mesh(pcfg)
        opt = make_optimizer(c)
        with activate_mesh(mesh):
            state = init_train_state(model, c, aux, opt)
            state = TrainState(shard_params(state.params, mesh),
                               zero_shard_opt_state(state.opt_state, mesh),
                               state.step)
            b = shard_batch(batch, mesh)
            step = jax.jit(make_train_step(model, c, opt))
            dt = timed_loop(step, state, b, aux,
                            rng_key=jax.random.PRNGKey(0))
        results[name] = dt

    # scale the SPMD layouts to --devices (hardcoding 8 would crash with
    # fewer devices and silently under-use more, corrupting the relative
    # comparison this script exists to produce)
    D = args.devices
    spmd_case(f"dp{D}", ParallelConfig(data=D))
    if D % 4 == 0:
        spmd_case(f"dp{D // 4}_sp4",
                  ParallelConfig(data=D // 4, lat=2, lon=2))

    # PP x DP
    if args.devices < NUM_STAGES:
        raise SystemExit(
            f"pipeline layout needs at least {NUM_STAGES} devices "
            f"(one group per stage); got --devices {args.devices}")
    c = cfg.replace(parallel=ParallelConfig(data=args.devices // NUM_STAGES,
                                            pipe=NUM_STAGES))
    mesh = make_mesh(c.parallel)
    opt = make_optimizer(c)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        upper[:1], surface[:1], aux)
    pipe = PanguPipeline(c, mesh, params)
    pstate = pipe.init_train_state(params, opt)
    pstep = pipe.make_train_step(opt, num_microbatches=args.microbatches)
    pstate, ploss = pstep(pstate, batch, aux)
    jax.block_until_ready(ploss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        pstate, ploss = pstep(pstate, batch, aux)
    jax.block_until_ready(ploss)
    results[f"pp{NUM_STAGES}_dp{args.devices // NUM_STAGES}"
            f"_m{args.microbatches}"] = (
        time.perf_counter() - t0) / args.steps

    S, M = NUM_STAGES, args.microbatches
    out = {
        "global_batch": B,
        "steps": args.steps,
        "seconds_per_step": {k: round(v, 4) for k, v in results.items()},
        f"relative_to_dp{D}": {k: round(v / results[f"dp{D}"], 3)
                               for k, v in results.items()},
        "gpipe_bubble_fraction": round((S - 1) / (M + S - 1), 3),
        "note": "virtual CPU mesh: schedule overhead only, not ICI",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
