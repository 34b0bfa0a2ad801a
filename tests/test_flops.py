"""Analytic matmul-FLOP counter vs the traced jaxpr, to the FLOP.

Walks the jaxpr of the real forward pass (f32/XLA path), sums the FLOPs of
every dot_general from its dimension numbers, and requires the analytic
count (pangu_tpu/utils/flops.py) to match exactly — the counter is then a
trustworthy basis for the MFU fields bench.py reports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import pangu_pretrain, pangu_tiny
from pangu_tpu.model import PanguModel
from pangu_tpu.utils.flops import (
    forward_matmul_flops,
    mfu,
    peak_flops,
    train_matmul_flops,
)

pytestmark = pytest.mark.fast


def _dot_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = np.prod([lhs.shape[i] for i in lb], dtype=np.float64) if lb else 1.0
    contract = np.prod([lhs.shape[i] for i in lc], dtype=np.float64)
    lhs_free = np.prod(
        [d for i, d in enumerate(lhs.shape) if i not in set(lc) | set(lb)],
        dtype=np.float64)
    rhs_free = np.prod(
        [d for i, d in enumerate(rhs.shape) if i not in set(rc) | set(rb)],
        dtype=np.float64)
    return 2.0 * batch * contract * lhs_free * rhs_free


def _sum_jaxpr_dot_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            total += _dot_flops(eqn)
        # standard containers for sub-jaxprs (remat, pjit, scan, cond, ...).
        # ONE recursion mechanism only: also walking
        # jax.core.jaxprs_in_params visited the same sub-jaxprs a second
        # time and doubled every remat'd/jitted dot (found in review).
        for key in ("jaxpr", "call_jaxpr", "branches", "cond_jaxpr",
                    "body_jaxpr"):
            sub = eqn.params.get(key)
            if sub is None:
                continue
            subs = sub if isinstance(sub, (tuple, list)) else [sub]
            for s in subs:
                inner = getattr(s, "jaxpr", s)
                if hasattr(inner, "eqns"):
                    total += _sum_jaxpr_dot_flops(inner)
    return total


def _traced_forward_flops(cfg, batch=1) -> float:
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (batch, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (batch, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = jax.eval_shape(
        lambda: PanguModel(m).init(jax.random.PRNGKey(0), upper, surface, aux))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    jaxpr = jax.make_jaxpr(
        lambda p, u, s: model.apply(p, u, s, aux, True))(
            params, upper, surface)
    return _sum_jaxpr_dot_flops(jaxpr.jaxpr)


def test_tiny_exact_match():
    cfg = pangu_tiny()
    analytic = forward_matmul_flops(cfg.model)["total"]
    traced = _traced_forward_flops(cfg)
    assert traced == pytest.approx(analytic, rel=1e-12), (
        analytic, traced, forward_matmul_flops(cfg.model))


def test_tiny_batch_scales_linearly():
    cfg = pangu_tiny()
    one = forward_matmul_flops(cfg.model, batch=1)["total"]
    three = forward_matmul_flops(cfg.model, batch=3)["total"]
    assert three == pytest.approx(3 * one, rel=1e-12)
    assert _traced_forward_flops(cfg, batch=3) == pytest.approx(three,
                                                               rel=1e-12)


def test_flagship_magnitude():
    """Full-geometry forward is ~8.7 TFLOP — pin the order of magnitude so a
    units regression (MAC vs FLOP, batch slip) cannot ship silently."""
    fl = forward_matmul_flops(pangu_pretrain(horizon=24).model)
    assert 1e12 < fl["total"] < 1e13
    # attention + MLP dominate the backbone
    assert (fl["attention"] + fl["mlp"]) > 0.6 * fl["total"]


def test_subjaxpr_dots_counted_once():
    """Sub-jaxprs (remat/pjit) recurse exactly once: a checkpointed matmul
    counts 2*m*k*n, not double (the bug a second recursion mechanism
    introduced — each remat'd dot was visited twice)."""
    a = jnp.zeros((4, 4), jnp.float32)
    jaxpr = jax.make_jaxpr(jax.checkpoint(lambda a, b: a @ b))(a, a)
    assert _sum_jaxpr_dot_flops(jaxpr.jaxpr) == 2.0 * 4 * 4 * 4
    jaxpr2 = jax.make_jaxpr(jax.jit(lambda a, b: a @ b))(a, a)
    assert _sum_jaxpr_dot_flops(jaxpr2.jaxpr) == 2.0 * 4 * 4 * 4


def test_train_is_three_forwards():
    cfg = pangu_tiny()
    assert train_matmul_flops(cfg.model) == pytest.approx(
        3 * forward_matmul_flops(cfg.model)["total"])


def test_mfu_and_peaks():
    assert peak_flops("TPU v5 lite") == 197e12
    assert peak_flops("TPU vX future") is None
    assert mfu(197e12, 1.0, "TPU v5 lite") == pytest.approx(1.0)
    assert mfu(1.0, 1.0, "TPU vX future") is None
    assert mfu(1.0, 0.0, "TPU v5 lite") is None
