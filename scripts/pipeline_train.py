#!/usr/bin/env python
"""Pipeline-parallel training entry point (role of the reference's
``deepspeed --num_gpus=8 models/pangu_model_deepspeed.py`` smoke trainer,
reference models/pangu_model_deepspeed.py:102-125 + train.sh:55).

Runs the GPipe schedule (`pangu_tpu.parallel.pipeline`) over a
``(data, pipe)`` mesh for a bounded number of steps and reports losses —
the pipeline counterpart of `scripts/finetune.py` (which drives the
recommended SPMD path). ``parallel.pipe`` picks the stage count: any
contiguous partition size of the 8-op backbone chain (2 = mid-network cut,
4 = the reference's U-Net joints, default when unset); needs
``pipe * parallel.data`` devices.

    python scripts/pipeline_train.py --preset tiny \
        --set data.store=synthetic --set parallel.pipe=4 \
        --steps 4 --microbatches 2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.parallel import distributed_init, is_main, make_mesh


def main() -> None:
    p = base_parser("GPipe pipeline-parallel training")
    p.add_argument("--steps", type=int, default=4,
                   help="number of optimizer steps to run")
    p.add_argument("--microbatches", type=int, default=2)
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="bootstrap an N-device virtual CPU platform "
                        "(local smoke runs without a pod)")
    args = p.parse_args()

    if args.virtual_devices:
        from pangu_tpu.parallel.mesh import ensure_virtual_devices

        # the explicit --virtual-devices flag IS the opt-in
        ensure_virtual_devices(args.virtual_devices, allow_replace_backend=True)

    distributed_init()
    cfg = build_config(args)
    if cfg.parallel.pipe == 1:
        import dataclasses

        cfg = cfg.replace(parallel=dataclasses.replace(cfg.parallel, pipe=4))

    import jax

    from pangu_tpu.aux import load_aux_constants
    from pangu_tpu.data import make_loader
    from pangu_tpu.parallel.pipeline import PanguPipeline
    from pangu_tpu.train.step import make_optimizer
    from pangu_tpu.utils.logger import get_logger

    out_dir = os.path.join(cfg.out_dir, "pipeline_train", str(cfg.horizon))
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("pipeline", os.path.join(out_dir, "pipeline.log"))

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, params = load_model_and_params(cfg, args, aux)

    mesh = make_mesh(cfg.parallel)
    pipeline = PanguPipeline(cfg, mesh, params)
    batch_size = args.microbatches * cfg.parallel.data
    loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon, batch_size)
    # steps_per_epoch converts the epoch-valued lr_milestones (25/50,
    # reference finetune_fully.py:205) to step boundaries; the default of 1
    # would halve the LR twice within the first epoch (scripts/finetune.py
    # wires this identically)
    optimizer = make_optimizer(cfg, steps_per_epoch=len(loader))
    state = pipeline.init_train_state(params, optimizer)
    step = pipeline.make_train_step(optimizer, args.microbatches)

    it = iter(loader)
    for i in range(args.steps):
        try:
            batch, _ = next(it)
        except StopIteration:
            it = iter(loader)
            batch, _ = next(it)
        state, loss = step(state, batch, aux)
        if is_main():
            logger.info("step %d: loss %.6f", i, float(loss))

    if is_main():
        final = pipeline.unstack_params(state.params)
        n = sum(np.asarray(x).size for x in jax.tree.leaves(final))
        logger.info("done: %d steps, %s params, mesh %s", args.steps,
                    f"{n:,}", dict(zip(mesh.axis_names, mesh.devices.shape)))


if __name__ == "__main__":
    main()
