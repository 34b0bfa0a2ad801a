import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import DataConfig, pangu_tiny
from pangu_tpu.data import make_loader
from pangu_tpu.model import PanguModel
from pangu_tpu.train.lora import (
    LoraConfig,
    changed_param_report,
    count_trainable,
    init_lora_params,
    lora_target_paths,
    make_lora_eval_step,
    make_lora_train_step,
    merge_params,
)
from pangu_tpu.train.step import TrainState, make_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    m = cfg.model
    rng = np.random.default_rng(0)
    upper = rng.standard_normal((1, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal((1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)
    return cfg, model, params, aux, upper, surface


def test_targets_exclude_io_heads(setup):
    cfg, model, params, *_ = setup
    lcfg = LoraConfig()
    targets = lora_target_paths(params, lcfg)
    joined = ["/".join(t) for t in targets]
    assert any("attn/qkv" in j for j in joined)
    assert any("mlp/fc1" in j for j in joined)
    assert any("downsample" in j for j in joined)
    assert not any("patch_recovery" in j for j in joined)
    assert not any("patch_embed" in j for j in joined)


def test_merge_identity_at_init(setup):
    """B=0 at init -> merged == base except nothing (delta is zero)."""
    cfg, model, params, aux, upper, surface = setup
    lcfg = LoraConfig()
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    merged = merge_params(params, trainable, lcfg)
    out_b = model.apply(params, upper, surface, aux)
    out_m = model.apply(merged, upper, surface, aux)
    np.testing.assert_allclose(
        np.asarray(out_m[0]), np.asarray(out_b[0]), atol=1e-6
    )
    assert count_trainable(trainable) < sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
    )


def test_lora_training_moves_only_targets(setup):
    import dataclasses

    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, lr=1e-3),
        data=DataConfig(train_start="20180101", train_end="20180105",
                        train_freq="24h", prefetch=0),
    )
    lcfg = LoraConfig()
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    opt = make_optimizer(cfg)
    state = TrainState(trainable, opt.init(trainable), jnp.zeros((), jnp.int32))
    step = jax.jit(make_lora_train_step(model, cfg, opt, params, lcfg))

    loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon, 1)
    batch, _ = next(iter(loader))
    losses = []
    for i in range(4):
        state, loss = step(state, batch, aux, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    merged = merge_params(params, state.params, lcfg)
    changed = changed_param_report(params, merged)
    assert any("attn/qkv/kernel" in c for c in changed)
    # biases and norms are never LoRA targets -> unchanged
    assert not any(c.endswith("norm1/scale") for c in changed)
    assert not any("attn/qkv/bias" in c for c in changed)
    # full-train subtrees did move
    assert any(c.startswith("params/patch_recovery") for c in changed)


def test_lora_through_trainer_early_stop_and_best(setup, tmp_path):
    """LoRA routed through the full Trainer (reference
    finetune/lora_tune.py:250 -> pangu_sample.py:278-381): validation,
    early stopping, best-model tracking and checkpoint-resume all apply to
    the LoRA tree."""
    import dataclasses

    from pangu_tpu.train.trainer import Trainer

    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, lr=1e-3, epochs=6, early_stop=2, val_interval=1,
            save_interval=1,
        ),
        data=DataConfig(train_start="20180101", train_end="20180104",
                        train_freq="24h", val_start="20180105",
                        val_end="20180108", val_freq="24h", prefetch=0),
    )
    lcfg = LoraConfig()
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))

    out_dir = str(tmp_path / "lora")
    trainer = Trainer(
        cfg, model, aux, out_dir, steps_per_epoch=2,
        train_step_fn=lambda opt: make_lora_train_step(
            model, cfg, opt, params, lcfg),
        eval_step_fn=make_lora_eval_step(model, cfg, params, lcfg),
    )
    state = TrainState(trainable, trainer.optimizer.init(trainable),
                       jnp.zeros((), jnp.int32))

    train_loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon, 1)
    val_loader = make_loader(cfg.data, cfg.model, "val", cfg.horizon, 1)
    best, final_state = trainer.fit(train_loader, val_loader, state=state)

    # best params are a LoRA tree, not the full model tree
    assert set(best) == {"lora", "full"}
    # checkpoints of the LoRA tree were written and resume round-trips them
    resumed, next_epoch = trainer.resume(
        template=TrainState(trainable, trainer.optimizer.init(trainable),
                            jnp.zeros((), jnp.int32)))
    assert next_epoch >= 2
    assert set(resumed.params) == {"lora", "full"}
    # merged best evaluates finitely
    ev = make_lora_eval_step(model, cfg, params, lcfg)
    batch, _ = next(iter(make_loader(cfg.data, cfg.model, "val",
                                     cfg.horizon, 1)))
    assert np.isfinite(float(ev(best, batch, aux)))


def test_sharded_val_stats_lockstep():
    """Multi-host validation is LOCKSTEP: every host walks its whole
    (per-process-sharded) loader — no batch skipping, which would
    desynchronize collective launches. Without an active mesh the batches
    pass through unassembled. (The data-sharded global-assembly path is
    covered by tests/test_sharding.py::test_lockstep_val_assembly...)"""
    from pangu_tpu.train.trainer import sharded_val_stats

    losses = [1.0, 2.0, 3.0, 4.0, 5.0]
    loader = [((i, None), None) for i in range(5)]

    def eval_step(params, batch, aux):
        return losses[batch[0]]

    for count in (1, 4):
        s, n = sharded_val_stats(eval_step, None, loader, None, count)
        assert (s, n) == (15.0, 5)


def test_unmerged_equals_merged_at_zero_dropout(setup):
    """peft's unmerged forward (adapters on the "lora" collection, applied
    per Dense site) is exactly the merged param surgery when lora-dropout
    is 0: same loss, same adapter gradients."""
    import dataclasses

    from pangu_tpu.train.step import Batch

    cfg, model, params, aux, upper, surface = setup
    # stochastic depth off: merged/unmerged share rng streams by name, but
    # the droppath draw count must not depend on the formulation
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, drop_path_max=0.0))
    model = PanguModel(cfg.model)
    lcfg = LoraConfig(dropout=0.0)
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    # make the adapter deltas nonzero so the comparison is not trivially 0=0
    trainable["lora"] = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(
            jax.random.PRNGKey(2), x.shape, x.dtype),
        trainable["lora"])
    batch = Batch(upper, surface, np.zeros_like(upper),
                  np.zeros_like(surface))

    from pangu_tpu.train.lora import apply_full_overrides, lora_collection
    from pangu_tpu.train.step import loss_fn

    rngs = {"droppath": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(6),
            "lora": jax.random.PRNGKey(7)}

    def merged_loss(t):
        return loss_fn(model, merge_params(params, t, lcfg), batch, aux,
                       cfg, rngs, deterministic=False)

    def unmerged_loss(t):
        p = apply_full_overrides(params, t)
        p = {**p, "lora": lora_collection(t, lcfg)}
        return loss_fn(model, p, batch, aux, cfg, rngs, deterministic=False)

    lm, gm = jax.value_and_grad(merged_loss)(trainable)
    lu, gu = jax.value_and_grad(unmerged_loss)(trainable)
    np.testing.assert_allclose(float(lu), float(lm), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6),
        gm, gu)


def test_unmerged_adapter_dropout_is_stochastic(setup):
    """With lora-dropout > 0 the unmerged loss depends on the "lora" rng
    (per-token masks on the adapter branch) while the merged form cannot
    express it — the divergence the unmerged mode exists to close."""
    import dataclasses

    from pangu_tpu.train.lora import apply_full_overrides, lora_collection
    from pangu_tpu.train.step import Batch, loss_fn

    cfg, model, params, aux, upper, surface = setup
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, drop_path_max=0.0))
    model = PanguModel(cfg.model)
    lcfg = LoraConfig(dropout=0.5)
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    trainable["lora"] = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(
            jax.random.PRNGKey(2), x.shape, x.dtype),
        trainable["lora"])
    batch = Batch(upper, surface, np.zeros_like(upper),
                  np.zeros_like(surface))
    p = apply_full_overrides(params, trainable)
    p = {**p, "lora": lora_collection(trainable, lcfg)}

    def loss_with(seed):
        rngs = {"droppath": jax.random.PRNGKey(5),
                "dropout": jax.random.PRNGKey(6),
                "lora": jax.random.PRNGKey(seed)}
        return float(loss_fn(model, p, batch, aux, cfg, rngs,
                             deterministic=False))

    assert loss_with(7) != loss_with(8)
    # deterministic (eval) applies adapters without dropout == merged form
    lm = float(loss_fn(model, merge_params(params, trainable, lcfg), batch,
                       aux, cfg, deterministic=True))
    lu = float(loss_fn(model, p, batch, aux, cfg, deterministic=True))
    np.testing.assert_allclose(lu, lm, rtol=1e-5)


def test_unmerged_train_step_runs(setup):
    import dataclasses

    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, lr=1e-3),
        data=DataConfig(train_start="20180101", train_end="20180105",
                        train_freq="24h", prefetch=0),
    )
    lcfg = LoraConfig(dropout=0.1)
    trainable = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    opt = make_optimizer(cfg)
    state = TrainState(trainable, opt.init(trainable),
                       jnp.zeros((), jnp.int32))
    step = jax.jit(make_lora_train_step(model, cfg, opt, params, lcfg,
                                        unmerged=True))
    loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon, 1)
    batch, _ = next(iter(loader))
    losses = []
    for i in range(4):
        state, loss = step(state, batch, aux, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
