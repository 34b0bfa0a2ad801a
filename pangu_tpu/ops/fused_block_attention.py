"""Fully-fused windowed attention over the token grid — Pallas TPU kernel.

Reads (wz, wh, W, C) slabs straight out of the (B, Z, Hp, W, C) activation
grid via BlockSpec index maps — the window partition/reverse transposes of
the XLA path (two full-activation 8D transposes per block, reference
models/layers.py:253-276) never happen. One grid program handles one
(z-window, h-window) row — i.e. one window *type* — for all ``W/ww``
longitude windows:

    slab -> qkv = slab@Wqkv + b          (one fat (wz*wh*W, C) MXU matmul)
    per lon-window, per head: (T,T) scores + earth bias [+ shift mask]
      -> fp32 softmax -> @v               (T = wz*wh*ww = 144 tokens)
    concat -> out = acc@Wproj + b         (one fat matmul)
    -> written back as the same slab.

Scores never touch HBM; the per-type bias is fetched exactly once per
program; weights use constant index maps and stay resident.

FLOP layout note: head_dim is 32, so score matmuls use a 32-deep contraction
(25% MXU lane utilization) — but attention is ~20% of model FLOPs; the fat
qkv/proj matmuls here and the XLA-side MLP dominate and run full-width.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.windows import window_partition, window_reverse


_LN_EPS = 1e-5


def _make_kernel(window: Tuple[int, int, int], w: int, c: int, heads: int,
                 scale: float, with_mask: bool, with_epilogue: bool,
                 precise: bool):
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    rows = wz * wh * w
    d = c // heads
    prec = jax.lax.Precision.HIGHEST if precise else jax.lax.Precision.DEFAULT

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
               *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        if with_epilogue:
            ln_s_ref = rest.pop(0)
            ln_b_ref = rest.pop(0)
        out_ref, acc_ref = rest

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            qkv = (jax.lax.dot_general(
                xw, wqkv_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]

                scores = jax.lax.dot_general(
                    qh, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) * scale
                scores = scores + bias_ref[0, h]
                if with_mask:
                    scores = scores + mask_ref[0]  # noqa: mask present iff with_mask

                m = jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vh.dtype)

                acc_ref[:, h * d:(h + 1) * d] = jnp.dot(
                    p, vh, preferred_element_type=jnp.float32, precision=prec,
                ).astype(acc_ref.dtype)

            y = jax.lax.dot_general(
                acc_ref[:], wproj_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) + bproj_ref[:].astype(jnp.float32)
            if with_epilogue:
                # post-norm residual (reference models/layers.py:296):
                # out = shortcut + LayerNorm(attn_out); the shortcut is the
                # same (possibly rolled/padded) window fed to attention —
                # valid because rolls commute with per-token ops and pad
                # rows are cropped by the caller.
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
                y = (y - mu) * jax.lax.rsqrt(var + _LN_EPS)
                y = y * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
                y = y + xw.astype(jnp.float32)
            out_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                y.astype(out_ref.dtype).reshape(wz, wh, ww, c)
            )

    return kernel


def _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask, window,
                   heads: int, scale: float, precision=None,
                   ln_scale=None, ln_bias=None):
    """Same math via the XLA window path (off-TPU fallback + backward)."""
    b, z, hp, w, c = x.shape
    xw = window_partition(x, window)  # (B, nW, nT, T, C)
    t = xw.shape[3]
    qkv = (
        jnp.einsum("...c,cf->...f", xw, wqkv, precision=precision,
                   preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(qkv.shape[:4] + (3, heads, c // heads))
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    attn = jnp.einsum("bwnqhd,bwnkhd->bwnhqk", q * scale, k,
                      precision=precision, preferred_element_type=jnp.float32)
    attn = attn + bias[None, None].astype(jnp.float32)
    if mask is not None:
        attn = attn + mask[None, None, :, None].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bwnhqk,bwnkhd->bwnqhd", attn, v, precision=precision,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(out.shape[:3] + (t, c))
    out = (
        jnp.einsum("...c,cf->...f", out, wproj, precision=precision,
                   preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    if ln_scale is not None:
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(out * out, axis=-1, keepdims=True) - mu * mu
        out = (out - mu) * jax.lax.rsqrt(var + _LN_EPS)
        out = out * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
        out = out + xw.astype(jnp.float32)
    out = out.astype(x.dtype)
    return window_reverse(out, window, z, hp, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_block_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                          ln_scale, ln_bias,
                          window: Tuple[int, int, int], heads: int,
                          scale: float):
    """x: (B, Z, Hp, W, C) -> (B, Z, Hp, W, C). Params in Dense layout
    (wqkv (C, 3C), wproj (C, C)); bias (nT, heads, T, T); mask (nT, T, T)|None.

    With ``ln_scale``/``ln_bias`` the kernel applies the block's post-norm
    residual epilogue ``x + LayerNorm(attn(x))`` in VMEM."""
    return _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
                    window, heads, scale)


def _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
             window, heads, scale):
    # fp32 activations double every VMEM buffer past the 16MB budget; fp32 is
    # the parity path, so it takes the (HIGHEST-precision) XLA formula.
    if jax.default_backend() != "tpu" or x.dtype == jnp.float32:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                              window, heads, scale, precision=prec,
                              ln_scale=ln_scale, ln_bias=ln_bias)

    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww
    rows = wz * wh * w
    precise = False  # bf16-only kernel; fp32 routed to XLA above

    grid = (b, zn, hn)

    def const_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda bb, zi, hi: (0,) * arr.ndim,
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((1, wz, wh, w, c),
                     lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        const_spec(wqkv),
        const_spec(bqkv),
        const_spec(wproj),
        const_spec(bproj),
        pl.BlockSpec((1, heads, t, t),
                     lambda bb, zi, hi: (zi * hn + hi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, wqkv, bqkv, wproj, bproj, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, t, t),
                         lambda bb, zi, hi: (zi * hn + hi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    with_epilogue = ln_scale is not None
    if with_epilogue:
        in_specs.append(const_spec(ln_scale))
        in_specs.append(const_spec(ln_bias))
        args.append(ln_scale)
        args.append(ln_bias)

    kernel = _make_kernel(window, w, c, heads, scale, mask is not None,
                          with_epilogue, precise)

    n_windows = b * zn * hn * (w // ww)
    flops = n_windows * (
        2 * t * c * 3 * c
        + heads * 2 * 2 * t * t * (c // heads)
        + 2 * t * c * c
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, wz, wh, w, c),
                               lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),  # per-window attention output
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize + bias.size * 4,
            transcendentals=n_windows * heads * t * t,
        ),
    )(*args)
    return out


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
         window, heads, scale):
    out = _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
                   window, heads, scale)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias)


def _bwd(window, heads, scale, res, g):
    x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias = res
    if ln_scale is None:
        _, vjp = jax.vjp(
            lambda x, wqkv, bqkv, wproj, bproj, bias: _xla_reference(
                x, wqkv, bqkv, wproj, bproj, bias, mask, window, heads, scale
            ),
            x, wqkv, bqkv, wproj, bproj, bias,
        )
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = vjp(g)
        return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None, None, None
    _, vjp = jax.vjp(
        lambda x, wqkv, bqkv, wproj, bproj, bias, s, t: _xla_reference(
            x, wqkv, bqkv, wproj, bproj, bias, mask, window, heads, scale,
            ln_scale=s, ln_bias=t,
        ),
        x, wqkv, bqkv, wproj, bproj, bias, ln_scale, ln_bias,
    )
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias, ds, dt = vjp(g)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None, ds, dt


fused_block_attention.defvjp(_fwd, _bwd)
