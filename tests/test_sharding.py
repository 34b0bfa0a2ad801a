"""Multi-device SPMD paths on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import ParallelConfig, pangu_tiny
from pangu_tpu.model import PanguModel
from pangu_tpu.parallel import (
    activate_mesh,
    make_mesh,
    record_shardings,
    shard_batch,
    shard_params,
    zero_shard_opt_state,
)
from pangu_tpu.parallel.sharding import _zero_spec
from pangu_tpu.train.step import Batch, make_optimizer, make_train_step
from pangu_tpu.train.trainer import TrainState, init_train_state


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def _tiny_batch(cfg, batch_size):
    m = cfg.model
    rng = np.random.default_rng(0)
    return Batch(
        upper=rng.standard_normal(
            (batch_size, m.upper_vars, m.levels, m.lat, m.lon)
        ).astype(np.float32),
        surface=rng.standard_normal(
            (batch_size, m.surface_vars, m.lat, m.lon)
        ).astype(np.float32),
        target_upper=rng.standard_normal(
            (batch_size, m.upper_vars, m.levels, m.lat, m.lon)
        ).astype(np.float32),
        target_surface=rng.standard_normal(
            (batch_size, m.surface_vars, m.lat, m.lon)
        ).astype(np.float32),
    )


def test_zero_spec_rule():
    assert _zero_spec((192, 576), 8) == P(None, "data")
    assert _zero_spec((7,), 8) == P()  # nothing divisible -> replicated
    assert _zero_spec((8,), 8) == P("data")
    assert _zero_spec((), 8) == P()
    assert _zero_spec((16, 32), 1) == P()


def test_mesh_shapes():
    _need_devices(8)
    mesh = make_mesh(ParallelConfig(data=2, lat=2, lon=2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "pipe": 1, "lat": 2, "lon": 2,
    }
    with pytest.raises(ValueError):
        make_mesh(ParallelConfig(data=16))


@pytest.mark.parametrize("pcfg,batch", [
    # pure DP (data=8) is covered by test_sharded_matches_single_device and
    # test_zero2_grad_sharding... below — not re-parametrized here (compile
    # time on the 1-core CPU box dominates the suite).
    (ParallelConfig(data=2, lat=2, lon=2), 2),  # DP + spatial SP
    (ParallelConfig(data=1, lat=2, lon=4), 1),  # pure spatial
])
def test_sharded_train_step(pcfg, batch):
    _need_devices(pcfg.data * pcfg.lat * pcfg.lon)
    cfg = pangu_tiny()
    mesh = make_mesh(pcfg)
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    opt = make_optimizer(cfg)

    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        state = TrainState(
            shard_params(state.params, mesh),
            zero_shard_opt_state(state.opt_state, mesh),
            state.step,
        )
        b = shard_batch(_tiny_batch(cfg, batch), mesh)
        step = jax.jit(make_train_step(model, cfg, opt))
        state, loss = step(state, b, aux, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # opt state moments really are sharded over 'data' when possible
        if pcfg.data > 1:
            adam = state.opt_state[1]  # (add_decayed, scale_by_adam, lr)
            leaves = [l for l in jax.tree.leaves(adam.mu) if hasattr(l, "sharding")]
            assert any(
                "data" in (l.sharding.spec or ()) for l in leaves
            ), "no ZeRO-sharded moment found"


def test_sharded_matches_single_device():
    """DP over 8 devices must reproduce the single-device step numerically."""
    _need_devices(8)
    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    opt = make_optimizer(cfg)
    batch = _tiny_batch(cfg, 8)
    rng = jax.random.PRNGKey(0)

    state1 = init_train_state(model, cfg, aux, opt)
    _, loss_single = jax.jit(make_train_step(model, cfg, opt))(state1, batch, aux, rng)

    mesh = make_mesh(ParallelConfig(data=8))
    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        state = TrainState(
            shard_params(state.params, mesh),
            zero_shard_opt_state(state.opt_state, mesh),
            state.step,
        )
        b = shard_batch(batch, mesh)
        _, loss_dp = jax.jit(make_train_step(model, cfg, opt))(
            state, b, aux, rng
        )
    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-5)


def _spec_axes(spec):
    out = set()
    for s in spec:
        if s is None:
            continue
        out.update((s,) if isinstance(s, str) else tuple(s))
    return out


def _assert_blocks_lat_sharded(log, n_expected_blocks):
    blocks = [(tag, shape, spec) for tag, shape, spec in log
              if tag and tag.startswith("block:")]
    assert len(blocks) == n_expected_blocks, [t for t, _, _ in blocks]
    for tag, shape, spec in blocks:
        axes = _spec_axes(spec)
        assert "lat" in axes and "lon" in axes, (
            f"{tag} with shape {shape} lost spatial sharding: {spec}"
        )


def test_lat_axis_actually_shards_tiny():
    """Every block's residual stream must be lat- AND lon-sharded on a
    (2,2,2) mesh — this fails if valid_spec silently drops the lat axis
    (round-1 bug: constraints were applied to the odd unpadded extents)."""
    _need_devices(8)
    cfg = pangu_tiny()
    mesh = make_mesh(ParallelConfig(data=2, lat=2, lon=2))
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    opt = make_optimizer(cfg)

    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        b = shard_batch(_tiny_batch(cfg, 2), mesh)
        with record_shardings() as log:
            jax.jit(make_train_step(model, cfg, opt)).lower(
                state, b, aux, jax.random.PRNGKey(0)
            )
    _assert_blocks_lat_sharded(log, sum(cfg.model.depths))


def test_lat_axis_actually_shards_flagship():
    """Same assertion at the full 721x1440 geometry, trace-only: params come
    from eval_shape and the forward is only lowered, never executed."""
    _need_devices(8)
    from pangu_tpu.config import ModelConfig, TrainConfig

    m = ModelConfig()
    cfg_model = m
    aux = synthetic_aux_constants(cfg_model, TrainConfig())
    model = PanguModel(cfg_model)
    upper = jax.ShapeDtypeStruct(
        (1, m.upper_vars, m.levels, m.lat, m.lon), np.float32
    )
    surface = jax.ShapeDtypeStruct((1, m.surface_vars, m.lat, m.lon), np.float32)
    aux_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), aux
    )
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), upper, surface, aux_sds)

    mesh = make_mesh(ParallelConfig(data=2, lat=2, lon=2))
    with activate_mesh(mesh), record_shardings() as log:
        jax.jit(
            lambda p, u, s, a: model.apply(p, u, s, a, True)
        ).lower(params, upper, surface, aux_sds)
    _assert_blocks_lat_sharded(log, sum(m.depths))


def test_spatial_sharded_matches_single_device():
    """Pure spatial sharding (lat=2, lon=4) must reproduce the single-device
    step numerically — catches pad-row zeroing bugs under sharding."""
    _need_devices(8)
    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    opt = make_optimizer(cfg)
    batch = _tiny_batch(cfg, 1)
    rng = jax.random.PRNGKey(0)

    state1 = init_train_state(model, cfg, aux, opt)
    _, loss_single = jax.jit(make_train_step(model, cfg, opt))(state1, batch, aux, rng)

    mesh = make_mesh(ParallelConfig(data=1, lat=2, lon=4))
    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        state = TrainState(
            shard_params(state.params, mesh),
            zero_shard_opt_state(state.opt_state, mesh),
            state.step,
        )
        b = shard_batch(batch, mesh)
        _, loss_sp = jax.jit(make_train_step(model, cfg, opt))(state, b, aux, rng)
    np.testing.assert_allclose(float(loss_single), float(loss_sp), rtol=1e-5)


def test_zero2_grad_sharding_matches_and_saves_memory():
    """The ZeRO-2 schedule (reduce-scatter grads / all-gather params) must
    be numerically identical to the replicated-gradient path, and the
    per-device memory math must show the data-axis saving."""
    _need_devices(8)
    from pangu_tpu.parallel import zero_bytes_per_device

    cfg_on = pangu_tiny()
    cfg_off = cfg_on.replace(parallel=dataclasses.replace(
        cfg_on.parallel, zero_gradients=False))
    aux = synthetic_aux_constants(cfg_on.model, cfg_on.train)
    model = PanguModel(cfg_on.model)
    opt = make_optimizer(cfg_on)
    batch = _tiny_batch(cfg_on, 8)
    rng = jax.random.PRNGKey(0)

    mesh = make_mesh(ParallelConfig(data=8))
    losses, trees = [], []
    for cfg in (cfg_on, cfg_off):
        with activate_mesh(mesh):
            state = init_train_state(model, cfg, aux, opt)
            state = TrainState(
                shard_params(state.params, mesh),
                zero_shard_opt_state(state.opt_state, mesh),
                state.step,
            )
            b = shard_batch(batch, mesh)
            state, loss = jax.jit(make_train_step(model, cfg, opt))(
                state, b, aux, rng)
            losses.append(float(loss))
            trees.append(jax.device_get(state.params))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(trees[0]), jax.tree.leaves(trees[1])):
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=1e-7)

    params = trees[0]
    sharded = zero_bytes_per_device(params, mesh, True)
    replicated = zero_bytes_per_device(params, mesh, False)
    # most weight bytes divide the 8-way data axis
    assert sharded < 0.3 * replicated


def test_lockstep_val_assembly_matches_local():
    """The multi-host validation path assembles per-process batches into one
    global data-sharded array and launches in lockstep; with a single
    process the assembled launch must score exactly like the plain local
    loop (and the assembly itself must produce a data-sharded batch)."""
    _need_devices(8)
    from pangu_tpu.train.step import make_eval_step
    from pangu_tpu.train.trainer import sharded_val_stats

    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    opt = make_optimizer(cfg)
    batches = [(_tiny_batch(cfg, 8), None), (_tiny_batch(cfg, 8), None)]

    mesh = make_mesh(ParallelConfig(data=8))
    with activate_mesh(mesh):
        state = init_train_state(model, cfg, aux, opt)
        eval_step = jax.jit(make_eval_step(model, cfg))

        plain_sum, plain_n = sharded_val_stats(
            eval_step, state.params, batches, aux, 1)
        # count > 1 switches on global assembly; single-process local data
        # IS the full global batch, so the score must be identical
        lock_sum, lock_n = sharded_val_stats(
            eval_step, state.params, batches, aux, 2)
    assert plain_n == lock_n == 2
    np.testing.assert_allclose(lock_sum, plain_sum, rtol=1e-6)


def test_graft_entry_dryrun():
    _need_devices(8)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_signature():
    import __graft_entry__ as ge

    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)


def test_ensure_virtual_devices_requires_opt_in():
    """Replacing a live backend with virtual CPU devices is destructive for
    the rest of the process; without the explicit opt-in it must raise
    instead of silently degrading a real run to CPU (ADVICE r2)."""
    import pytest

    from pangu_tpu.parallel.mesh import ensure_virtual_devices

    have = len(jax.devices())
    # satisfiable requests never touch the backend
    assert len(ensure_virtual_devices(min(have, 1))) == min(have, 1)
    with pytest.raises(RuntimeError, match="allow_replace_backend"):
        ensure_virtual_devices(have + 8)


def test_ensure_virtual_devices_pins_cpu_before_discovery():
    """With the host-platform flag set and no backend initialized yet,
    ensure_virtual_devices must bootstrap the CPU platform WITHOUT probing
    the default plugin first: through a dead device tunnel that probe hangs
    (not raises), deadlocking validation entry points like the driver's
    dryrun_multichip."""
    import os
    import subprocess
    import sys

    code = (
        "import os, sys\n"
        "sys.path.insert(0, os.getcwd())\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=6'\n"
        "os.environ.pop('JAX_PLATFORMS', None)\n"
        "from pangu_tpu.parallel.mesh import ensure_virtual_devices\n"
        "devs = ensure_virtual_devices(6, allow_replace_backend=True)\n"
        "assert all(d.platform == 'cpu' for d in devs), devs\n"
        "print('OK', len(devs))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=240,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "OK 6" in out.stdout, (out.stdout, out.stderr[-500:])


def test_distributed_init_env_gating(monkeypatch):
    """distributed_init: no-op on a bare single host, auto-init when a pod
    environment announces itself (NOT only via JAX_NUM_PROCESSES)."""
    import jax

    from pangu_tpu.parallel.mesh import distributed_init

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(a))
    for var in ("JAX_NUM_PROCESSES", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)

    distributed_init()
    assert calls == []  # bare single host: no-op

    # every TPU VM sets TPU_WORKER_HOSTNAMES; a single hostname is NOT a pod
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    distributed_init()
    assert calls == []

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    distributed_init()
    assert calls == []  # explicit single process: no-op

    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    distributed_init()
    assert calls == [()]  # env-driven pod: no-arg auto-init

    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    distributed_init()
    assert len(calls) == 2 and calls[1] == ()  # pod metadata alone suffices

    distributed_init("10.0.0.1:1234", 2, 0)  # explicit args pass through
    assert calls[2] == ("10.0.0.1:1234", 2, 0)


def test_resolve_mesh_policy(caplog):
    """Entry-point mesh resolution (round-3 verdict #6): a default parallel
    config must auto-expand to all attached devices; an explicit config that
    leaves devices idle must warn; single-device stays mesh-free."""
    from pangu_tpu.parallel import resolve_mesh

    _need_devices(8)
    devices = jax.devices()

    # default 1x1x1x1 config on a multi-device host -> pure DP over all
    mesh = resolve_mesh(ParallelConfig(), devices)
    assert mesh is not None and mesh.shape["data"] == len(devices)

    # explicit config covering fewer devices -> honored, but loud
    import logging

    with caplog.at_level(logging.WARNING, logger="pangu_tpu"):
        mesh = resolve_mesh(ParallelConfig(data=2), devices)
    assert mesh.shape["data"] == 2
    assert any("IDLE" in r.getMessage() for r in caplog.records)

    # explicit config covering everything -> no warning
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="pangu_tpu"):
        mesh = resolve_mesh(ParallelConfig(data=4, lat=2), devices)
    assert dict(mesh.shape) == {"data": 4, "pipe": 1, "lat": 2, "lon": 1}
    assert not caplog.records

    # single device: no mesh (annotation-free path)...
    assert resolve_mesh(ParallelConfig(), devices[:1]) is None
    # ...and an impossible explicit config fails with advice
    with pytest.raises(ValueError, match="only 1 is"):
        resolve_mesh(ParallelConfig(data=2), devices[:1])
