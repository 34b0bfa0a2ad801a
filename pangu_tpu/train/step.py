"""Jitted train / eval step builders.

One compiled function per role; gradient accumulation is a `lax.scan` over a
leading microbatch axis inside the same jit (the TPU-native form of the
reference's python-side accumulation loop, models/pangu_sample.py:147-149,
223-233), so the optimizer update and all collective traffic happen once per
step regardless of accumulation factor.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pangu_tpu.aux import AuxConstants, norm_data
from pangu_tpu.config import PanguConfig
from pangu_tpu.model import PanguModel
from pangu_tpu.train.loss import weighted_l1_loss
from pangu_tpu.train.schedule import multistep_lr


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    """One training sample pair in physical units.

    upper: (B, Vu, L, lat, lon); surface: (B, Vs, lat, lon); targets same.
    With gradient accumulation, a leading microbatch axis (A, B, ...) is added.
    """

    upper: jnp.ndarray
    surface: jnp.ndarray
    target_upper: jnp.ndarray
    target_surface: jnp.ndarray


def make_optimizer(cfg: PanguConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Adam with coupled L2 weight decay + MultiStep schedule — matching
    torch.optim.Adam(lr, weight_decay) semantics (decay added to the gradient
    *before* the moment updates; reference finetune/finetune_fully.py:202-207)."""
    sched = multistep_lr(
        cfg.train.lr, cfg.train.lr_milestones, cfg.train.lr_gamma, steps_per_epoch
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(sched),
    )


def loss_fn(
    model: PanguModel,
    params: Any,
    batch: Batch,
    aux: AuxConstants,
    cfg: PanguConfig,
    rngs: Optional[Dict[str, jax.Array]] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    out_u, out_s = model.apply(
        params, batch.upper, batch.surface, aux, deterministic,
        rngs=rngs or {},
    )
    tgt_u, tgt_s = norm_data(batch.target_upper, batch.target_surface, aux)
    mask = aux.custom_mask if cfg.train.use_custom_mask else None
    return weighted_l1_loss(
        out_u, out_s, tgt_u, tgt_s, aux,
        only_wind_speed=cfg.train.only_wind_speed_loss,
        mask=mask,
    )


def make_train_step(
    model: PanguModel, cfg: PanguConfig, optimizer: optax.GradientTransformation
) -> Callable:
    """Returns step(state, batch, aux, rng) -> (state, loss).

    If ``cfg.train.accumulation_steps > 1`` the batch must carry a leading
    microbatch axis of that length; gradients are averaged across it.
    """
    accum = cfg.train.accumulation_steps
    bf16_grads = cfg.model.grads_dtype == "bfloat16"

    def single_grads(params, batch, aux, rng):
        r_path, r_drop = jax.random.split(rng)
        rngs = {"droppath": r_path, "dropout": r_drop}
        vg = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, aux, cfg, rngs, deterministic=False)
        )
        if not bf16_grads:
            return vg(params)
        # Mixed-precision grad tree (cfg.model.grads_dtype): differentiate
        # w.r.t. a bf16-cast parameter copy — the backward's per-use-site
        # bf16->f32 cotangent convert+reduce disappears — then cast the
        # grads up ONCE so the f32 masters/moments below are unchanged.
        half = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
        loss, g = vg(half)
        return loss, jax.tree.map(lambda gl, p: gl.astype(p.dtype), g, params)

    def step(state: TrainState, batch: Batch, aux: AuxConstants, rng) -> Tuple[TrainState, jnp.ndarray]:
        if accum > 1:
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                micro, r = xs
                loss, grads = single_grads(state.params, micro, aux, r)
                loss_sum, grad_sum = carry
                return (loss_sum + loss, jax.tree.map(jnp.add, grad_sum, grads)), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero), (batch, rngs)
            )
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, grad_sum)
        else:
            loss, grads = single_grads(state.params, batch, aux, rng)

        # ZeRO-2 schedule (reference ds_config.json): reduce-scatter the
        # gradients onto the data axis, update each shard against the
        # (equally sharded) optimizer moments, all-gather the new params.
        from pangu_tpu.parallel.sharding import replicate_constraint, zero_constraint

        zero2 = cfg.parallel.zero_gradients and cfg.parallel.zero_opt_state
        grads = zero_constraint(grads, zero2)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = replicate_constraint(params, zero2)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_eval_step(model: PanguModel, cfg: PanguConfig) -> Callable:
    """Returns eval(params, batch, aux) -> loss (validation-loss semantics of
    reference models/pangu_sample.py:278-327)."""

    def step(params, batch: Batch, aux: AuxConstants) -> jnp.ndarray:
        return loss_fn(model, params, batch, aux, cfg, deterministic=True)

    return step


def make_forward(model: PanguModel) -> Callable:
    """Pure normalized-space forward: (params, upper, surface, aux) ->
    (out_upper, out_surface). The single compiled artifact shared by eval,
    rollout and serving."""

    def forward(params, upper, surface, aux: AuxConstants):
        return model.apply(params, upper, surface, aux, True)

    return forward
