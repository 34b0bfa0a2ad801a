"""Fused MLP + post-LayerNorm + residual — Pallas TPU kernel.

Computes the second half of an Earth-Specific block in one HBM round trip
(reference models/layers.py:297: ``x = x + drop_path(norm2(mlp(x)))``):

    out = x + LayerNorm(GELU(x @ W1 + b1) @ W2 + b2)

The XLA version moves the (rows, 4C) hidden activation and several
LayerNorm/residual temporaries through HBM; here the hidden exists only in
VMEM per row-chunk. Grid is 1D over row chunks; weights stay resident.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5


def _layer_norm_f32(y, scale, bias):
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
    return (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _erf_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |error| < 1.5e-7 (fp32-grade).
    Mosaic has no erf primitive; exp is a native transcendental."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(h):
    """0.5 * h * (1 + erf(h / sqrt(2))) — torch nn.GELU semantics."""
    return 0.5 * h * (1.0 + _erf_f32(h * np.float32(0.7071067811865476)))


def _make_kernel(precise: bool):
    prec = jax.lax.Precision.HIGHEST if precise else jax.lax.Precision.DEFAULT

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref, t_ref, out_ref):
        x = x_ref[:]
        h = jax.lax.dot_general(
            x, w1_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) + b1_ref[:].astype(jnp.float32)
        h = _gelu_exact_f32(h).astype(x.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) + b2_ref[:].astype(jnp.float32)
        y = _layer_norm_f32(y, s_ref[:].astype(jnp.float32),
                            t_ref[:].astype(jnp.float32))
        out_ref[:] = (y + x.astype(jnp.float32)).astype(out_ref.dtype)

    return kernel


def _xla_reference(x2d, w1, b1, w2, b2, scale, bias, precision=None):
    h = (jnp.einsum("rc,cf->rf", x2d, w1, precision=precision,
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(x2d.dtype)
    h = jax.nn.gelu(h, approximate=False)
    y = (jnp.einsum("rf,fc->rc", h, w2, precision=precision,
                    preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32))
    y = _layer_norm_f32(y, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return (y + x2d.astype(jnp.float32)).astype(x2d.dtype)


def _pick_chunk(rows: int, c: int) -> int:
    budget = 1440 if c <= 256 else 720
    for chunk in range(min(budget, rows), 0, -8):
        if rows % chunk == 0 and chunk % 8 == 0:
            return chunk
    return 0


@jax.custom_vjp
def fused_mlp_block(x, w1, b1, w2, b2, scale, bias):
    """x: (..., C) -> x + LN(GELU(x@W1+b1)@W2+b2). Any leading shape."""
    return _forward(x, w1, b1, w2, b2, scale, bias)


def _forward(x, w1, b1, w2, b2, scale, bias):
    shape = x.shape
    c = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    x2d = x.reshape(rows, c)

    chunk = _pick_chunk(rows, c)
    if jax.default_backend() != "tpu" or chunk == 0 or x.dtype == jnp.float32:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _xla_reference(x2d, w1, b1, w2, b2, scale, bias,
                              precision=prec).reshape(shape)

    kernel = _make_kernel(precise=False)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    hidden = w1.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(rows // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(w1), const_spec(b1), const_spec(w2), const_spec(b2),
            const_spec(scale), const_spec(bias),
        ],
        out_specs=pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * hidden * 2,
            bytes_accessed=2 * rows * c * x.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
    )(x2d, w1, b1, w2, b2, scale, bias)
    return out.reshape(shape)


def _fwd(x, w1, b1, w2, b2, scale, bias):
    return _forward(x, w1, b1, w2, b2, scale, bias), (x, w1, b1, w2, b2, scale, bias)


def _bwd(res, g):
    x, w1, b1, w2, b2, scale, bias = res
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    _, vjp = jax.vjp(_xla_reference, x2d, w1, b1, w2, b2, scale, bias)
    dx, dw1, db1, dw2, db2, ds, dbi = vjp(g.reshape(-1, c))
    return dx.reshape(shape), dw1, db1, dw2, db2, ds, dbi


fused_mlp_block.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Raw MLP (no LN / residual) with a flash-style Pallas backward — the
# TRAINING path. The training epilogue (LayerNorm + stochastic depth +
# residual) must stay unfused, but the MLP itself is the dominant term of
# the train step's XLA bucket: its backward materializes the (rows, 4C)
# hidden twice in HBM. Here the forward saves only x; the backward
# recomputes the hidden per row-chunk in VMEM and accumulates weight/bias
# grads in VMEM-resident output blocks across the sequential grid (same
# scheme as ops/fused_block_attention._make_bwd_kernel).
# ---------------------------------------------------------------------------


def _gelu_grad_f32(h):
    """d/dh gelu(h) = Phi(h) + h * phi(h) (exact-erf form, matching
    jax.nn.gelu(approximate=False) gradients)."""
    phi = jnp.exp(np.float32(-0.5) * h * h) * np.float32(0.3989422804014327)
    cdf = 0.5 * (1.0 + _erf_f32(h * np.float32(0.7071067811865476)))
    return cdf + h * phi


def _make_raw_fwd_kernel():
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        x = x_ref[:]
        h = jax.lax.dot_general(
            x, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        h = _gelu_exact_f32(h).astype(x.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        out_ref[:] = y.astype(out_ref.dtype)

    return kernel


def _make_raw_bwd_kernel():
    def kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref,
               dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        def dot(a, b, ta=False, tb=False):
            dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        x = x_ref[:]
        g = g_ref[:]
        gf = g.astype(jnp.float32)

        # recompute the hidden pre-activation (never stored in HBM)
        h = dot(x, w1_ref[:]) + b1_ref[:].astype(jnp.float32)
        a = _gelu_exact_f32(h).astype(x.dtype)

        db2_ref[:] += jnp.sum(gf, axis=0, keepdims=True)
        dw2_ref[:] += dot(a, g, ta=True)

        dh = dot(g, w2_ref[:], tb=True) * _gelu_grad_f32(h)
        dhw = dh.astype(x.dtype)
        db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
        dw1_ref[:] += dot(x, dhw, ta=True)
        dx_ref[:] = dot(dhw, w1_ref[:], tb=True).astype(dx_ref.dtype)

    return kernel


def _raw_xla(x2d, w1, b1, w2, b2, precision=None):
    h = (jnp.einsum("rc,cf->rf", x2d, w1, precision=precision,
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(x2d.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return (jnp.einsum("rf,fc->rc", h, w2, precision=precision,
                       preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32)).astype(x2d.dtype)


def _use_pallas_mlp(x, rows: int, c: int) -> int:
    """Chunk size if the Pallas path applies, else 0."""
    if jax.default_backend() != "tpu" or x.dtype == jnp.float32:
        return 0
    return _pick_chunk(rows, c)


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """Raw MLP: (..., C) -> GELU(x@W1+b1)@W2+b2 with a flash-style Pallas
    backward on TPU bf16 (XLA einsums elsewhere). Unlike
    :func:`fused_mlp_block` this stops before LayerNorm/residual, so the
    training epilogue (stochastic depth) composes around it."""
    return _raw_forward(x, w1, b1, w2, b2)


def _raw_forward(x, w1, b1, w2, b2):
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2d = x.reshape(rows, c)
    chunk = _use_pallas_mlp(x, rows, c)
    if chunk == 0:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _raw_xla(x2d, w1, b1, w2, b2, precision=prec).reshape(shape)

    hidden = w1.shape[1]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_raw_fwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(w1), const_spec(b1), const_spec(w2), const_spec(b2),
        ],
        out_specs=pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * hidden * 2,
            bytes_accessed=2 * rows * c * x.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
    )(x2d, w1, b1, w2, b2)
    return out.reshape(shape)


def _raw_fwd(x, w1, b1, w2, b2):
    return _raw_forward(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _raw_bwd(res, g):
    x, w1, b1, w2, b2 = res
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2d = x.reshape(rows, c)
    g2d = g.reshape(rows, c)

    chunk = _use_pallas_mlp(x, rows, c)
    if chunk == 0:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        _, vjp = jax.vjp(
            lambda *a: _raw_xla(*a, precision=prec), x2d, w1, b1, w2, b2)
        dx, dw1, db1, dw2, db2 = vjp(g2d)
        return dx.reshape(shape), dw1, db1, dw2, db2

    hidden = w1.shape[1]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    chunk_spec = pl.BlockSpec((chunk, c), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _make_raw_bwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[chunk_spec, chunk_spec,
                  const_spec(w1), const_spec(b1), const_spec(w2)],
        out_specs=(chunk_spec, acc((c, hidden)), acc((1, hidden)),
                   acc((hidden, c)), acc((1, c))),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x.dtype),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * c * hidden * 2,
            bytes_accessed=3 * rows * c * x.dtype.itemsize,
            transcendentals=2 * rows * hidden,
        ),
    )(x2d, g2d, w1, b1, w2)
    return (dx.reshape(shape), dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


fused_mlp.defvjp(_raw_fwd, _raw_bwd)


# A/B switch (scripts/bench_train_ab.py): False routes the training block
# tail through raw fused_mlp + the unfused XLA epilogue (pre-fusion path).
_POSTNORM_FUSION = True


# ---------------------------------------------------------------------------
# Trainable post-norm MLP: the FULL second half of an Earth-Specific block —
#     out = x + s * LayerNorm(GELU(x@W1+b1)@W2+b2)
# with a per-row branch scale ``s`` (stochastic-depth mask / keep-prob, ones
# when inactive) — in ONE Pallas program each way. Compared to composing
# fused_mlp + XLA LayerNorm/DropPath/residual, this removes ~4 full-tensor
# HBM round trips per block (the LN fwd, LN bwd, residual add and droppath
# select fusions measured at ~1.2-1.6 ms each at full geometry). The
# backward recomputes the hidden AND the pre-LN output per chunk in VMEM
# (one extra (chunk,4C)x(4C,C) dot vs the raw flash backward, ~+20% MLP
# backward FLOPs — a net win against the removed HBM traffic,
# docs/PERFORMANCE.md round 3).
# ---------------------------------------------------------------------------


def _postnorm_xla(x2d, w1, b1, w2, b2, scale, bias, s, precision=None):
    y = (jnp.einsum("rc,cf->rf", x2d, w1, precision=precision,
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(x2d.dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = (jnp.einsum("rf,fc->rc", y, w2, precision=precision,
                    preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32))
    y = _layer_norm_f32(y, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return (x2d.astype(jnp.float32) + s * y).astype(x2d.dtype)


def _make_postnorm_fwd_kernel():
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref, t_ref, sc_ref,
               out_ref):
        x = x_ref[:]
        h = jax.lax.dot_general(
            x, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        h = _gelu_exact_f32(h).astype(x.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        y = _layer_norm_f32(y, s_ref[:].astype(jnp.float32),
                            t_ref[:].astype(jnp.float32))
        out_ref[:] = (x.astype(jnp.float32) + sc_ref[:] * y).astype(out_ref.dtype)

    return kernel


def _make_postnorm_bwd_kernel():
    def kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, lb_ref,
               sc_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
               dls_ref, dlb_ref, dsc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dls_ref[:] = jnp.zeros_like(dls_ref)
            dlb_ref[:] = jnp.zeros_like(dlb_ref)

        def dot(a, b, ta=False, tb=False):
            dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        x = x_ref[:]
        gf = g_ref[:].astype(jnp.float32)
        sc = sc_ref[:]  # (chunk, 1) f32
        gamma = ls_ref[:].astype(jnp.float32)

        # recompute hidden AND pre-LN output (neither stored in HBM)
        h = dot(x, w1_ref[:]) + b1_ref[:].astype(jnp.float32)
        a = _gelu_exact_f32(h).astype(x.dtype)
        y = dot(a, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
        r = jax.lax.rsqrt(var + _LN_EPS)
        yhat = (y - mu) * r

        # branch-scale grad (true value; the droppath mask is a constant in
        # practice, but correctness keeps grad-checks honest)
        lnout = yhat * gamma + lb_ref[:].astype(jnp.float32)
        dsc_ref[:] = jnp.sum(gf * lnout, axis=-1, keepdims=True)

        gb = gf * sc
        dls_ref[:] += jnp.sum(gb * yhat, axis=0, keepdims=True)
        dlb_ref[:] += jnp.sum(gb, axis=0, keepdims=True)
        dyhat = gb * gamma
        dy = r * (dyhat
                  - jnp.mean(dyhat, axis=-1, keepdims=True)
                  - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True))
        dyw = dy.astype(x.dtype)

        db2_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
        dw2_ref[:] += dot(a, dyw, ta=True)
        dh = dot(dyw, w2_ref[:], tb=True) * _gelu_grad_f32(h)
        dhw = dh.astype(x.dtype)
        db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
        dw1_ref[:] += dot(x, dhw, ta=True)
        dx_ref[:] = (dot(dhw, w1_ref[:], tb=True) + gf).astype(dx_ref.dtype)

    return kernel


@jax.custom_vjp
def fused_mlp_postnorm(x, w1, b1, w2, b2, ln_scale, ln_bias, branch_scale):
    """(..., C) -> x + branch_scale * LN(GELU(x@W1+b1)@W2+b2).

    ``branch_scale``: per-row (prod(leading), 1) f32 — the stochastic-depth
    mask/keep factor (ones when droppath is inactive). Training-path op:
    flash-style Pallas forward AND backward on TPU bf16, XLA elsewhere."""
    return _postnorm_forward(x, w1, b1, w2, b2, ln_scale, ln_bias,
                             branch_scale)


def _postnorm_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, branch_scale):
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2d = x.reshape(rows, c)
    s2d = branch_scale.reshape(rows, 1).astype(jnp.float32)
    chunk = _use_pallas_mlp(x, rows, c)
    if chunk == 0:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _postnorm_xla(x2d, w1, b1, w2, b2, ln_scale, ln_bias, s2d,
                             precision=prec).reshape(shape)

    hidden = w1.shape[1]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_postnorm_fwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(w1), const_spec(b1), const_spec(w2), const_spec(b2),
            const_spec(ln_scale), const_spec(ln_bias),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * hidden * 2,
            bytes_accessed=2 * rows * c * x.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
    )(x2d, w1, b1, w2, b2, ln_scale, ln_bias, s2d)
    return out.reshape(shape)


def _postnorm_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, branch_scale):
    return (_postnorm_forward(x, w1, b1, w2, b2, ln_scale, ln_bias,
                              branch_scale),
            (x, w1, b1, w2, b2, ln_scale, ln_bias, branch_scale))


def _postnorm_bwd(res, g):
    x, w1, b1, w2, b2, ln_scale, ln_bias, branch_scale = res
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2d = x.reshape(rows, c)
    g2d = g.reshape(rows, c)
    s2d = branch_scale.reshape(rows, 1).astype(jnp.float32)

    chunk = _use_pallas_mlp(x, rows, c)
    if chunk == 0:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        _, vjp = jax.vjp(
            lambda *a: _postnorm_xla(*a, precision=prec),
            x2d, w1, b1, w2, b2, ln_scale, ln_bias, s2d)
        dx, dw1, db1, dw2, db2, dls, dlb, ds = vjp(g2d)
        return (dx.reshape(shape), dw1, db1, dw2, db2, dls, dlb,
                ds.reshape(branch_scale.shape).astype(branch_scale.dtype))

    hidden = w1.shape[1]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    chunk_spec = pl.BlockSpec((chunk, c), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2, dls, dlb, ds = pl.pallas_call(
        _make_postnorm_bwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[chunk_spec, chunk_spec,
                  const_spec(w1), const_spec(b1), const_spec(w2),
                  const_spec(b2), const_spec(ln_scale), const_spec(ln_bias),
                  s_spec],
        out_specs=(chunk_spec, acc((c, hidden)), acc((1, hidden)),
                   acc((hidden, c)), acc((1, c)),
                   acc((1, c)), acc((1, c)), s_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x.dtype),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * rows * c * hidden * 2,
            bytes_accessed=3 * rows * c * x.dtype.itemsize,
            transcendentals=2 * rows * hidden,
        ),
    )(x2d, g2d, w1, b1, w2, b2, ln_scale, ln_bias, s2d)
    return (dx.reshape(shape), dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            ds.reshape(branch_scale.shape).astype(branch_scale.dtype))


fused_mlp_postnorm.defvjp(_postnorm_fwd, _postnorm_bwd)
