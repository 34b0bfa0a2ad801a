"""Fused post-norm residual epilogue — Pallas TPU kernel.

The attention-side half of an Earth-Specific block's training epilogue
(reference models/layers.py:296: ``x = shortcut + drop_path(norm1(attn))``):

    out = shortcut + s * LayerNorm(a)

with a per-row stochastic-depth branch scale ``s`` (mask/keep, ones when
inactive). One program each way: the XLA formulation runs the LayerNorm
statistics, normalize, droppath select and residual add as separate
full-tensor HBM passes (f32 temporaries); here everything happens per
row-chunk in VMEM. The backward recomputes the LN statistics from ``a``
(never stored) and returns the incoming cotangent itself for dshortcut
(zero-copy). The MLP-side twin is ops/fused_mlp.py::fused_mlp_postnorm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.fused_mlp import _layer_norm_f32, _pick_chunk

_LN_EPS = 1e-5


def _res_xla(shortcut2d, a2d, gamma, beta, s):
    y = _layer_norm_f32(a2d.astype(jnp.float32), gamma.astype(jnp.float32),
                        beta.astype(jnp.float32))
    return (shortcut2d.astype(jnp.float32) + s * y).astype(shortcut2d.dtype)


def _make_fwd_kernel():
    def kernel(sh_ref, a_ref, g_ref, b_ref, sc_ref, out_ref):
        y = _layer_norm_f32(a_ref[:].astype(jnp.float32),
                            g_ref[:].astype(jnp.float32),
                            b_ref[:].astype(jnp.float32))
        out_ref[:] = (sh_ref[:].astype(jnp.float32)
                      + sc_ref[:] * y).astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel():
    def kernel(a_ref, g_ref, ls_ref, lb_ref, sc_ref,
               da_ref, dls_ref, dlb_ref, dsc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dls_ref[:] = jnp.zeros_like(dls_ref)
            dlb_ref[:] = jnp.zeros_like(dlb_ref)

        a = a_ref[:].astype(jnp.float32)
        gf = g_ref[:].astype(jnp.float32)
        sc = sc_ref[:]  # (chunk, 1) f32
        gamma = ls_ref[:].astype(jnp.float32)

        mu = jnp.mean(a, axis=-1, keepdims=True)
        var = jnp.mean(a * a, axis=-1, keepdims=True) - mu * mu
        r = jax.lax.rsqrt(var + _LN_EPS)
        yhat = (a - mu) * r

        lnout = yhat * gamma + lb_ref[:].astype(jnp.float32)
        dsc_ref[:] = jnp.sum(gf * lnout, axis=-1, keepdims=True)

        gb = gf * sc
        dls_ref[:] += jnp.sum(gb * yhat, axis=0, keepdims=True)
        dlb_ref[:] += jnp.sum(gb, axis=0, keepdims=True)
        dyhat = gb * gamma
        da = r * (dyhat
                  - jnp.mean(dyhat, axis=-1, keepdims=True)
                  - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True))
        da_ref[:] = da.astype(da_ref.dtype)

    return kernel


def _use_pallas(x) -> bool:
    return jax.default_backend() == "tpu" and x.dtype != jnp.float32


@jax.custom_vjp
def fused_residual_postnorm(shortcut, a, ln_scale, ln_bias, branch_scale):
    """(..., C) -> shortcut + branch_scale * LN(a).

    ``branch_scale``: per-row (leading dims broadcastable to a[:-1], 1) f32 —
    the stochastic-depth mask/keep factor (ones when droppath is inactive).
    Training-path op: Pallas on TPU bf16, equivalent XLA chain elsewhere."""
    return _res_forward(shortcut, a, ln_scale, ln_bias, branch_scale)


def _res_forward(shortcut, a, ln_scale, ln_bias, branch_scale):
    shape = a.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    a2d = a.reshape(rows, c)
    sh2d = shortcut.reshape(rows, c)
    s2d = jnp.broadcast_to(branch_scale, shape[:-1] + (1,)) \
        .reshape(rows, 1).astype(jnp.float32)
    chunk = _pick_chunk(rows, c) if _use_pallas(a) else 0
    if chunk == 0:
        return _res_xla(sh2d, a2d, ln_scale, ln_bias, s2d).reshape(shape)

    out = pl.pallas_call(
        _make_fwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ln_scale.shape, lambda i: (0,) * ln_scale.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ln_bias.shape, lambda i: (0,) * ln_bias.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), shortcut.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * c,
            bytes_accessed=3 * rows * c * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(sh2d, a2d, ln_scale, ln_bias, s2d)
    return out.reshape(shape)


def _res_fwd(shortcut, a, ln_scale, ln_bias, branch_scale):
    return (_res_forward(shortcut, a, ln_scale, ln_bias, branch_scale),
            (a, ln_scale, ln_bias, branch_scale))


def _res_bwd(res, g):
    a, ln_scale, ln_bias, branch_scale = res
    shape = a.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    a2d = a.reshape(rows, c)
    g2d = g.reshape(rows, c)
    bshape = shape[:-1] + (1,)
    s2d = jnp.broadcast_to(branch_scale, bshape) \
        .reshape(rows, 1).astype(jnp.float32)

    def reduce_ds(ds_rows):
        """Un-broadcast the per-row scale grad back to branch_scale.shape."""
        ds = ds_rows.reshape(bshape)
        axes = tuple(i for i in range(len(bshape))
                     if branch_scale.shape[i] == 1 and bshape[i] != 1)
        if axes:
            ds = jnp.sum(ds, axis=axes, keepdims=True)
        return ds.reshape(branch_scale.shape).astype(branch_scale.dtype)

    chunk = _pick_chunk(rows, c) if _use_pallas(a) else 0
    if chunk == 0:
        _, vjp = jax.vjp(_res_xla, jnp.zeros_like(g2d), a2d,
                         ln_scale, ln_bias, s2d)
        _, da, dls, dlb, ds = vjp(g2d)
        return (g, da.reshape(shape), dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), reduce_ds(ds))

    chunk_spec = pl.BlockSpec((chunk, c), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    cs = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                  memory_space=pltpu.VMEM)
    da, dls, dlb, ds = pl.pallas_call(
        _make_bwd_kernel(),
        grid=(rows // chunk,),
        in_specs=[chunk_spec, chunk_spec, cs(ln_scale), cs(ln_bias), s_spec],
        out_specs=(chunk_spec,
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   s_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), a.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * rows * c,
            bytes_accessed=3 * rows * c * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(a2d, g2d, ln_scale, ln_bias, s2d)
    # dshortcut is the cotangent itself — no copy, no kernel output.
    return (g, da.reshape(shape),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            reduce_ds(ds))


fused_residual_postnorm.defvjp(_res_fwd, _res_bwd)
