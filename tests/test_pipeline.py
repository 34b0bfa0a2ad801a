"""Pipeline parallelism (parallel/pipeline.py) vs the plain SPMD model.

The pipelined program must be a pure re-scheduling: same outputs, same
gradients, same training trajectory as single-device PanguModel — with the
stage parameters genuinely sharded over the 'pipe' mesh axis.
(Role of the reference's PanguModelPipe prototype and its __main__ smoke
train, models/pangu_model_deepspeed.py:18-125.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import ParallelConfig, pangu_tiny
from pangu_tpu.model import PanguModel
from pangu_tpu.parallel import make_mesh
from pangu_tpu.parallel.pipeline import (
    NUM_STAGES,
    PanguPipeline,
    merge_stage_params,
    split_stage_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(3)
    B = 4
    upper = rng.standard_normal(
        (B, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (B, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper[:1], surface[:1], aux)
    return cfg, model, aux, params, upper, surface


def test_param_split_roundtrip(setup):
    _, _, _, params, _, _ = setup
    stages = split_stage_params(params)
    assert len(stages) == NUM_STAGES
    merged = merge_stage_params(stages)
    jax.tree.map(np.testing.assert_array_equal, params, merged)


def test_stack_params_sharded_over_pipe(setup):
    cfg, _, _, params, _, _ = setup
    mesh = make_mesh(ParallelConfig(pipe=NUM_STAGES))
    pipe = PanguPipeline(cfg, mesh, params)
    stacked = pipe.stack_params(params)
    assert stacked.shape == (NUM_STAGES, pipe.pmax)
    assert "pipe" in stacked.sharding.spec  # each stage on its own devices
    rt = pipe.unstack_params(stacked)
    jax.tree.map(np.testing.assert_array_equal, params, rt)


@pytest.mark.parametrize("pcfg,microbatches", [
    (ParallelConfig(pipe=NUM_STAGES), 2),           # pure PP
    (ParallelConfig(data=2, pipe=NUM_STAGES), 2),   # PP x DP
    (ParallelConfig(pipe=2), 2),                    # 2-stage split
    (ParallelConfig(data=2, pipe=2), 2),            # 2-stage PP x DP
    (ParallelConfig(pipe=8), 2),                    # one op per stage
])
def test_pipeline_forward_matches_model(setup, pcfg, microbatches):
    cfg, model, aux, params, upper, surface = setup
    mesh = make_mesh(pcfg)
    pipe = PanguPipeline(cfg, mesh, params)
    fwd = pipe.make_forward(microbatches)
    got_u, got_s = jax.tree.map(
        np.asarray, fwd(pipe.stack_params(params), upper, surface, aux))

    ref_u, ref_s = jax.jit(
        lambda p, u, s: model.apply(p, u, s, aux, True)
    )(params, upper, surface)
    np.testing.assert_allclose(got_u, np.asarray(ref_u), atol=2e-5)
    np.testing.assert_allclose(got_s, np.asarray(ref_s), atol=2e-5)


def test_pipeline_train_step_matches_single_device(setup):
    """One Adam step through the pipeline == one step of the plain engine
    (same loss, same updated params)."""
    from pangu_tpu.train.step import Batch, make_optimizer, make_train_step
    from pangu_tpu.train.trainer import init_train_state

    _, _, aux, params, upper, surface = setup
    # drop_path off: the pipeline schedules stages deterministically, so the
    # comparison against the stochastic-depth plain engine must disable it.
    cfg = pangu_tiny(drop_path_max=0.0).replace(parallel=ParallelConfig(
        pipe=NUM_STAGES, zero_opt_state=False, zero_gradients=False))
    model = PanguModel(cfg.model)
    tgt_u = upper + 0.1
    tgt_s = surface + 0.1
    batch = Batch(upper, surface, tgt_u, tgt_s)
    optimizer = make_optimizer(cfg)

    mesh = make_mesh(cfg.parallel)
    pipe = PanguPipeline(cfg, mesh, params)
    pstate = pipe.init_train_state(params, optimizer)
    pstep = pipe.make_train_step(optimizer, num_microbatches=2)
    pstate, ploss = pstep(pstate, batch, aux)

    state = init_train_state(model, cfg, aux, optimizer, params=params)
    step = jax.jit(make_train_step(model, cfg, optimizer))
    state, loss = step(state, batch, aux, jax.random.PRNGKey(0))

    assert np.isfinite(float(ploss))
    np.testing.assert_allclose(float(ploss), float(loss), rtol=1e-5)

    got = pipe.unstack_params(pstate.params)
    flat_got = jax.tree.leaves_with_path(got)
    flat_ref = dict(jax.tree.leaves_with_path(state.params))
    assert flat_got and len(flat_got) == len(flat_ref)
    for path, leaf in flat_got:
        ref_leaf = np.asarray(flat_ref[path])
        scale = np.abs(ref_leaf).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(leaf), ref_leaf, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_bf16_transport(setup):
    """Inter-stage activations in bfloat16 halve ring-transfer bytes; raw
    inputs bypass the buffer (stage 0 reads the replicated f32 arrays), so
    only the O(1)-magnitude normalized activations are rounded."""
    cfg, model, aux, params, upper, surface = setup
    mesh = make_mesh(ParallelConfig(pipe=NUM_STAGES))
    pipe = PanguPipeline(cfg, mesh, params, transport_dtype=jnp.bfloat16)
    assert pipe.transport_dtype == jnp.bfloat16
    fwd = pipe.make_forward(2)
    got_u, got_s = jax.tree.map(
        np.asarray, fwd(pipe.stack_params(params), upper, surface, aux))
    ref_u, ref_s = jax.tree.map(np.asarray, jax.jit(
        lambda p, u, s: model.apply(p, u, s, aux, True)
    )(params, upper, surface))
    for got, ref in ((got_u, ref_u), (got_s, ref_s)):
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 2e-2  # bf16 rounding


def test_pipeline_droppath_rng(setup):
    """Stochastic depth runs under pipeline parallelism (divergence #12
    closed): rng-carrying steps vary per key, rng-free steps reproduce the
    deterministic schedule."""
    from pangu_tpu.train.step import Batch, make_optimizer

    _, _, aux, params, upper, surface = setup
    cfg = pangu_tiny(drop_path_max=0.5).replace(
        parallel=ParallelConfig(pipe=NUM_STAGES))
    batch = Batch(upper, surface, upper + 0.1, surface + 0.1)
    optimizer = make_optimizer(cfg)
    mesh = make_mesh(cfg.parallel)
    pipe = PanguPipeline(cfg, mesh, params)
    step = pipe.make_train_step(optimizer, num_microbatches=2)

    state0 = pipe.init_train_state(params, optimizer)
    _, loss_det = step(state0, batch, aux)
    state0 = pipe.init_train_state(params, optimizer)
    _, loss_det2 = step(state0, batch, aux)
    np.testing.assert_allclose(float(loss_det), float(loss_det2), rtol=1e-6)

    losses = []
    for seed in (1, 2):
        st = pipe.init_train_state(params, optimizer)
        _, loss = step(st, batch, aux, jax.random.PRNGKey(seed))
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    # rate 0.5 over 4 blocks: different keys drop different paths
    assert losses[0] != losses[1]
    assert float(loss_det) not in losses
