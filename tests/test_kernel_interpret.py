"""Pallas-kernel validation WITHOUT a TPU: interpret mode.

The on-device tests (tests/test_tpu_kernels.py) are the authority for what
Mosaic actually compiles, but they need a live chip. These tests execute the
SAME kernel bodies — grid, BlockSpecs, accumulator revisit patterns, SMEM
scalars and all — under the Pallas interpreter on CPU, by forcing the op's
TPU route and injecting ``interpret=True`` into every ``pallas_call``. They
catch kernel math/indexing bugs (wrong slab offsets, mis-zeroed accumulators,
stale scratch) the XLA-fallback tests structurally cannot, leaving only
Mosaic lowering issues to the on-device suite.

Kept to the one window-geometry slab a tiny grid allows (the token count per
window is fixed at 144 by the reference's (2,6,12) window) so the interpreter
stays fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pangu_tpu.ops import fused_block_attention as fba
from pangu_tpu.ops import fused_block_train as fbt
from pangu_tpu.ops import fused_epilogue as fep
from pangu_tpu.ops import fused_mlp as fml


@pytest.fixture
def interpret_tpu_route(monkeypatch):
    """Force every op down its Pallas route with interpreted kernels.

    The ops gate on ``jax.default_backend() == "tpu"`` (directly or via a
    module-local ``_use_pallas``); patching the public helper flips them all,
    while ``interpret=True`` keeps execution on the host.
    """
    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        # CompilerParams are Mosaic-only; the interpreter rejects them
        kw.pop("compiler_params", None)
        return real_call(*args, **kw)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fbt, "_use_pallas", lambda x: True)
    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _inputs(rng, z=2, hp=6, w=24, c=16, heads=2, masked=True, b=2):
    window = (2, 6, 12)
    t = 144
    nt = (z // window[0]) * (hp // window[1])
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    mkf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    args = (
        mk(b, z, hp, w, c),
        mk(c, 3 * c), mk(3 * c),
        mk(c, c), mk(c),
        mkf(nt, heads, t, t),
        (jnp.asarray(np.where(rng.uniform(size=(nt, t, t)) > 0.8, -100.0, 0.0),
                     jnp.float32) if masked else None),
        1.0 + mkf(c), mkf(c),
        mk(c, 4 * c), mk(4 * c),
        mk(4 * c, c), mk(c),
        1.0 + mkf(c), mkf(c),
        jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
    )
    return args, (window, heads, (c // heads) ** -0.5)


@pytest.mark.parametrize("masked", [False, True])
def test_block_train_fwd_kernel_interpreted(rng, interpret_tpu_route, masked):
    a, statics = _inputs(rng, masked=masked)
    got = fbt.fused_earth_block_train(*a, *statics)
    ref = fbt._xla_block_train(*a, *statics)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.04)  # bf16 stream; interpreter rounds f32 per op


@pytest.mark.parametrize("masked", [False, True])
def test_block_train_bwd_kernel_interpreted(rng, interpret_tpu_route, masked):
    """Every gradient from the interpreted flash backward matches the XLA
    vjp of the reference composition — including the cross-program weight
    accumulators (zeroed once, revisited by every grid step) and the
    per-program ds1/ds2 partials."""
    a, statics = _inputs(rng, masked=masked)
    mask = a[6]
    prim = a[:6] + a[7:]  # differentiable args (mask excluded)

    def loss_fused(*p):
        out = fbt.fused_earth_block_train(
            *p[:6], mask, *p[6:], *statics)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*p):
        out = fbt._xla_block_train(*p[:6], mask, *p[6:], *statics)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(prim))))(*prim)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(prim))))(*prim)
    names = ("x", "wqkv", "bqkv", "wproj", "bproj", "bias",
             "ln1_s", "ln1_b", "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
             "s1", "s2")
    for name, gf, gr in zip(names, g_fused, g_ref):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        scale = max(1.0, float(np.abs(gr).max()))
        np.testing.assert_allclose(
            gf / scale, gr / scale, rtol=0, atol=0.05,
            err_msg=f"grad mismatch: {name}")


def test_block_train_bwd_multiwindow_accumulators(rng, interpret_tpu_route):
    """Grid > 1 in every axis (2 z-slabs x 1 h x 2 batch, 2 windows per row):
    exercises the bb-innermost revisit pattern of the dbias block and the
    zero-once-accumulate-everywhere weight grads."""
    a, statics = _inputs(rng, z=4, hp=6, w=24, c=16, heads=2, masked=True, b=2)

    def loss(fn):
        def f(x, wqkv, bias):
            args = (x, wqkv) + a[2:5] + (bias,) + a[6:]
            return jnp.sum(fn(*args, *statics).astype(jnp.float32) ** 2)
        return f

    gx, gw, gb = jax.grad(loss(fbt.fused_earth_block_train),
                          argnums=(0, 1, 2))(a[0], a[1], a[5])
    rx, rw, rb = jax.grad(loss(fbt._xla_block_train),
                          argnums=(0, 1, 2))(a[0], a[1], a[5])
    for name, g, r in (("x", gx, rx), ("wqkv", gw, rw), ("bias", gb, rb)):
        g = np.asarray(g, np.float32)
        r = np.asarray(r, np.float32)
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(g / scale, r / scale, rtol=0, atol=0.05,
                                   err_msg=f"grad mismatch: {name}")


def _assert_close(got, ref, name="out", atol=0.04):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(got / scale, ref / scale, rtol=0, atol=atol,
                               err_msg=name)


@pytest.mark.parametrize("masked", [False, True])
def test_attention_kernel_fwd_and_flash_bwd_interpreted(
        rng, interpret_tpu_route, masked):
    """fused_block_attention (no epilogue): interpreted Pallas forward and
    the flash backward kernel vs the XLA reference's vjp."""
    a, (window, heads, scale) = _inputs(rng, z=4, hp=6, w=24, masked=masked)
    x, wqkv, bqkv, wproj, bproj, bias, mask = a[:7]

    def f_pallas(x, wqkv, bqkv, wproj, bias):
        out = fba.fused_block_attention(
            x, wqkv, bqkv, wproj, bproj, bias, mask, None, None,
            window, heads, scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def f_ref(x, wqkv, bqkv, wproj, bias):
        out = fba._xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                 window, heads, scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x, wqkv, bqkv, wproj, bias)
    vp, gp = jax.value_and_grad(f_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    vr, gr = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    _assert_close(vp, vr, "loss")
    for name, g, r in zip(("x", "wqkv", "bqkv", "wproj", "bias"), gp, gr):
        _assert_close(g, r, f"grad {name}", atol=0.05)


def test_attention_kernel_epilogue_fwd_interpreted(rng, interpret_tpu_route):
    """fused_block_attention with the in-kernel post-norm residual epilogue."""
    a, (window, heads, scale) = _inputs(rng, masked=True)
    x, wqkv, bqkv, wproj, bproj, bias, mask = a[:7]
    ln_s, ln_b = a[7], a[8]
    got = fba.fused_block_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                    ln_s, ln_b, window, heads, scale)
    ref = fba._xla_reference(x, wqkv, bqkv, wproj, bproj, bias,
                             mask, window, heads, scale,
                             ln_scale=ln_s, ln_bias=ln_b)
    _assert_close(got, ref)


def test_inference_megakernel_fwd_interpreted(rng, interpret_tpu_route):
    """fused_earth_block (inference whole-block megakernel) forward."""
    a, statics = _inputs(rng, masked=True)
    args = a[:16]  # drop s1/s2 — the inference op has no droppath scales
    got = fba.fused_earth_block(*args[:6], args[6], *args[7:15], *statics)
    ref = fba._xla_block_reference(*args[:6], args[6], *args[7:15], *statics)
    _assert_close(got, ref)


def test_mlp_raw_kernels_interpreted(rng, interpret_tpu_route):
    """fused_mlp raw forward + flash backward kernels (row-chunk grid)."""
    c, rows = 16, 64
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    x, w1, b1, w2, b2 = (mk(rows, c), mk(c, 4 * c), mk(4 * c),
                         mk(4 * c, c), mk(c))

    def f(fn):
        def g(*p):
            return jnp.sum(fn(*p).astype(jnp.float32) ** 2)
        return g

    vp, gp = jax.value_and_grad(f(fml.fused_mlp),
                                argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    vr, gr = jax.value_and_grad(f(fml._raw_xla),
                                argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    _assert_close(vp, vr, "loss")
    for name, g, r in zip(("x", "w1", "b1", "w2", "b2"), gp, gr):
        _assert_close(g, r, f"grad {name}", atol=0.05)


def test_mlp_postnorm_kernels_interpreted(rng, interpret_tpu_route):
    """fused_mlp_postnorm fwd + bwd kernels, with a droppath branch scale."""
    c, rows = 16, 64
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    mkf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x, w1, b1, w2, b2 = (mk(rows, c), mk(c, 4 * c), mk(4 * c),
                         mk(4 * c, c), mk(c))
    ln_s, ln_b = 1.0 + mkf(c), mkf(c)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (rows, 1)), jnp.float32)

    def f(fn):
        def g(*p):
            return jnp.sum(fn(*p, s).astype(jnp.float32) ** 2)
        return g

    args = (x, w1, b1, w2, b2, ln_s, ln_b)
    vp, gp = jax.value_and_grad(
        f(fml.fused_mlp_postnorm), argnums=tuple(range(7)))(*args)
    vr, gr = jax.value_and_grad(
        f(fml._postnorm_xla), argnums=tuple(range(7)))(*args)
    _assert_close(vp, vr, "loss")
    for name, g, r in zip(("x", "w1", "b1", "w2", "b2", "ln_s", "ln_b"),
                          gp, gr):
        _assert_close(g, r, f"grad {name}", atol=0.05)


def test_residual_postnorm_kernels_interpreted(rng, interpret_tpu_route):
    """fused_residual_postnorm fwd + bwd kernels."""
    c, rows = 16, 64
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    mkf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    short, act = mk(rows, c), mk(rows, c)
    ln_s, ln_b = 1.0 + mkf(c), mkf(c)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (rows, 1)), jnp.float32)

    def f(fn):
        def g(short, act, ln_s, ln_b):
            return jnp.sum(fn(short, act, ln_s, ln_b, s)
                           .astype(jnp.float32) ** 2)
        return g

    def ref(short, act, ln_s, ln_b, s):
        return fep._res_xla(short, act, ln_s, ln_b, s)

    args = (short, act, ln_s, ln_b)
    vp, gp = jax.value_and_grad(
        f(fep.fused_residual_postnorm), argnums=(0, 1, 2, 3))(*args)
    vr, gr = jax.value_and_grad(f(ref), argnums=(0, 1, 2, 3))(*args)
    _assert_close(vp, vr, "loss")
    for name, g, r in zip(("shortcut", "act", "ln_s", "ln_b"), gp, gr):
        _assert_close(g, r, f"grad {name}", atol=0.05)
