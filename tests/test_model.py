"""Model structure tests on the tiny geometry (seconds on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import pangu_tiny
from pangu_tpu.geometry import compute_geometry
from pangu_tpu.model import PanguModel
from pangu_tpu.model.attention import (
    shift_attention_mask,
    window_partition,
    window_reverse,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    rng = np.random.default_rng(1)
    upper = rng.standard_normal(
        (1, cfg.model.upper_vars, cfg.model.levels, cfg.model.lat, cfg.model.lon)
    ).astype(np.float32)
    surface = rng.standard_normal(
        (1, cfg.model.surface_vars, cfg.model.lat, cfg.model.lon)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)
    return cfg, model, params, upper, surface, aux


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 12, 24, 8)).astype(np.float32))
    w = (2, 6, 12)
    parts = window_partition(x, w)
    assert parts.shape == (2, 2, 2 * 2, 144, 8)
    back = window_reverse(parts, w, 4, 12, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_static():
    g = compute_geometry(pangu_tiny().model)
    m = shift_attention_mask(g.outer)
    assert m.shape == (g.outer.n_type_windows, 144, 144)
    assert set(np.unique(m)) <= {-100.0, 0.0}
    # masks are symmetric and zero on the diagonal
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))
    assert np.all(np.diagonal(m, axis1=1, axis2=2) == 0.0)


def test_shift_mask_traced_matches_numpy():
    """The in-graph iota mask (what the model compiles — no inlined literal)
    must equal the numpy oracle at every geometry the model uses."""
    from pangu_tpu.config import ModelConfig
    from pangu_tpu.model.attention import shift_attention_mask_traced

    stages = []
    for mc in (pangu_tiny().model, ModelConfig()):
        g = compute_geometry(mc)
        stages += [g.outer, g.inner]
    for st in stages:
        got = np.asarray(shift_attention_mask_traced(st))
        np.testing.assert_array_equal(got, shift_attention_mask(st))


def test_forward_shapes(tiny):
    cfg, model, params, upper, surface, aux = tiny
    out_u, out_s = model.apply(params, upper, surface, aux)
    assert out_u.shape == upper.shape
    assert out_s.shape == surface.shape
    assert np.isfinite(np.asarray(out_u)).all()
    assert np.isfinite(np.asarray(out_s)).all()


def test_forward_jit_and_batch2(tiny):
    cfg, model, params, upper, surface, aux = tiny
    fwd = jax.jit(lambda p, u, s: model.apply(p, u, s, aux))
    u2 = np.concatenate([upper, upper + 1.0])
    s2 = np.concatenate([surface, surface + 1.0])
    out_u, out_s = fwd(params, u2, s2)
    assert out_u.shape[0] == 2 and out_s.shape[0] == 2
    # batch elements are independent
    out_u1, out_s1 = fwd(params, u2[:1], s2[:1])
    np.testing.assert_allclose(np.asarray(out_u[0]), np.asarray(out_u1[0]), atol=1e-4)


def test_param_count_pretrained_config():
    """The pretrained geometry must produce the known ~256M parameter model
    (dominated by the dense earth biases, SURVEY §2.1)."""
    from pangu_tpu.config import ModelConfig

    cfg = ModelConfig()
    g = compute_geometry(cfg)
    # earth bias params alone
    outer_bias = g.outer.n_type_windows * 6 * 144 * 144
    inner_bias = g.inner.n_type_windows * 12 * 144 * 144
    total_bias = 4 * outer_bias + 12 * inner_bias
    assert total_bias == 4 * 124 * 6 * 144 * 144 + 12 * 64 * 12 * 144 * 144


def test_mlp_tail_mode_matches_unfused(rng):
    """Mlp's tail mode (postnorm_scale given) must equal the composed
    x + scale * LN(mlp(x)) formulation — the XLA fallback of the fused
    training block tail (ops/fused_mlp.py::fused_mlp_postnorm)."""
    from pangu_tpu.model.blocks import Mlp, apply_layer_norm

    dim = 16
    x = jnp.asarray(rng.standard_normal((2, 3, 4, dim)), jnp.float32)
    mlp = Mlp(dim)
    params = mlp.init(jax.random.PRNGKey(0), x)
    ln = (jnp.asarray(1.0 + 0.1 * rng.standard_normal(dim), jnp.float32),
          jnp.asarray(0.1 * rng.standard_normal(dim), jnp.float32))
    # droppath-like per-row scale: mix of 0 and 1/keep
    sc = jnp.asarray(
        np.where(rng.uniform(size=(2, 3, 4, 1)) > 0.4, 2.0, 0.0), jnp.float32)

    got = mlp.apply(params, x, ln=ln, deterministic=False, postnorm_scale=sc)
    y = mlp.apply(params, x, deterministic=False)
    ref = x + sc * apply_layer_norm(y, *ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_deterministic_vs_droppath(tiny):
    cfg, model, params, upper, surface, aux = tiny
    out1, _ = model.apply(params, upper, surface, aux, deterministic=True)
    out2, _ = model.apply(params, upper, surface, aux, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # training mode with droppath rng runs and differs across seeds
    o3, _ = model.apply(
        params, upper, surface, aux, False,
        rngs={"droppath": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(o3)).all()


@pytest.mark.parametrize("kw", [
    dict(lat=33, lon=192, levels=5, patch=(2, 4, 4), window=(2, 6, 12),
         depths=(1, 1, 1, 1), heads=(2, 2, 2, 2), dims=(16, 32, 32, 16)),
    dict(lat=50, lon=64, levels=6, patch=(2, 2, 2), window=(2, 4, 8),
         depths=(2, 1, 1, 2), heads=(2, 4, 4, 2), dims=(16, 32, 32, 16)),
    dict(lat=49, lon=96, levels=5, patch=(1, 4, 4), window=(3, 6, 12),
         depths=(1, 2, 2, 1), heads=(4, 4, 4, 4), dims=(16, 32, 32, 16)),
])
def test_forward_alternate_geometries(kw):
    """The same model code must run non-default patch/window/grid combos
    (shape-genericity — the reference hardcodes its geometry)."""
    from pangu_tpu.config import pangu_tiny

    cfg = pangu_tiny(**kw)
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)
    ).astype(np.float32)
    surface = rng.standard_normal((1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)
    out_u, out_s = model.apply(params, upper, surface, aux)
    assert out_u.shape == upper.shape and out_s.shape == surface.shape
    assert np.isfinite(np.asarray(out_u)).all()
