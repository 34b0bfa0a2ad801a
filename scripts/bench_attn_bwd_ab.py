"""A/B harness for the attention flash-backward kernel variants.

The round-3 profile puts the OUTER-stage attention backward at 23.1 ms/block
(6.2 us/window) while the inner stage runs at its FLOP-expected cost
(11.35 us/window at ~50 TFLOP/s); at inner-stage efficiency the outer
backward would cost 3.3 us/window. The excess is per-window fixed cost —
the prime suspects are the read-modify-write accumulator chains
(dwqkv/dwproj/dbias `+=` per window serializes each window's dots against
the previous window's accumulate). Variants:

  shipped — ops/fused_block_attention._backward_pallas as-is
  valacc  — weight/bias grads accumulate in python-level VALUES across the
            window loop; refs written once at the end (breaks the ref RMW
            chain; Mosaic schedules the adds against the next window's dots)
  pair    — two lon-windows per iteration: fat row-wise dots (qkv recompute,
            dwqkv, dx) run at M=288 instead of 144 (56% -> 75% M-tile
            utilization); score-path stays per-window

Timing: the full outer-stage backward pallas_call, chained via lax.scan
(carry = dx feeds the next iteration's x so nothing is dead-code-eliminated
and iterations serialize), paired-difference of two scan lengths — the same
tunnel-robust methodology as bench.py.

Usage: python scripts/bench_attn_bwd_ab.py [--stage outer|inner]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_bwd_kernel_variant(window, w, c, heads, scale, with_mask,
                             variant: str):
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    d = c // heads

    def kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        (dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
         dbias_ref, acc_ref, dqkv_ref) = rest

        zi, hi, bb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        first = (zi == 0) & (hi == 0) & (bb == 0)

        if variant != "valacc":
            @pl.when(first)
            def _():
                dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
                dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
                dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
                dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

        @pl.when(bb == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        def dot(a, b, ta=False, tb=False):
            dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        if variant == "valacc":
            vacc = {
                "dwqkv": jnp.zeros((c, 3 * c), jnp.float32),
                "dbqkv": jnp.zeros((1, 3 * c), jnp.float32),
                "dwproj": jnp.zeros((c, c), jnp.float32),
                "dbproj": jnp.zeros((1, c), jnp.float32),
            }
            dbias_parts = [jnp.zeros((t, t), jnp.float32)
                           for _ in range(heads)]

        step = 2 if variant == "pair" else 1
        for wi in range(0, wn, step):
            if variant == "pair":
                xw2 = x_ref[0, :, :, wi * ww:(wi + 2) * ww, :].reshape(
                    wz * wh, 2 * ww, c)
                gw2 = (g_ref[0, :, :, wi * ww:(wi + 2) * ww, :]
                       .reshape(wz * wh, 2 * ww, c))
                xwf = xw2.reshape(wz * wh * 2 * ww, c)
                gwf = gw2.reshape(wz * wh * 2 * ww, c).astype(jnp.float32)
                qkv2 = (dot(xwf, wqkv_ref[:])
                        + bqkv_ref[:].astype(jnp.float32)).astype(xwf.dtype)
                dbproj_ref[:] += jnp.sum(gwf, axis=0, keepdims=True)
                dacc2 = dot(gwf.astype(xwf.dtype), wproj_ref[:], tb=True)
                qkv3 = qkv2.reshape(wz * wh, 2 * ww, 3 * c)
                dacc3 = dacc2.reshape(wz * wh, 2 * ww, c)
                gw3 = gwf.reshape(wz * wh, 2 * ww, c)
                dqkv_parts = []
                for sub in range(2):
                    qkv = qkv3[:, sub * ww:(sub + 1) * ww, :].reshape(t, 3 * c)
                    dacc = dacc3[:, sub * ww:(sub + 1) * ww, :].reshape(t, c)
                    gw = gw3[:, sub * ww:(sub + 1) * ww, :].reshape(t, c)
                    dqkv_parts.append(_one_window(
                        dot, qkv, dacc, gw, bias_ref, mask_ref, acc_ref,
                        dbias_ref, dwproj_ref, heads, t, c, d, scale,
                        with_mask, None))
                dqkvf = jnp.concatenate(
                    [p.reshape(wz * wh, ww, 3 * c) for p in dqkv_parts],
                    axis=1).reshape(wz * wh * 2 * ww, 3 * c)
                dbqkv_ref[:] += jnp.sum(dqkvf, axis=0, keepdims=True)
                dqkvw = dqkvf.astype(xwf.dtype)
                dwqkv_ref[:] += dot(xwf, dqkvw, ta=True)
                dx_ref[0, :, :, wi * ww:(wi + 2) * ww, :] = (
                    dot(dqkvw, wqkv_ref[:], tb=True)
                    .astype(dx_ref.dtype).reshape(wz, wh, 2 * ww, c)
                )
                continue

            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            gw = (g_ref[0, :, :, wi * ww:(wi + 1) * ww, :]
                  .reshape(t, c).astype(jnp.float32))

            qkv = (dot(xw, wqkv_ref[:])
                   + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            if variant == "valacc":
                vacc["dbproj"] = vacc["dbproj"] + jnp.sum(
                    gw, axis=0, keepdims=True)
            else:
                dbproj_ref[:] += jnp.sum(gw, axis=0, keepdims=True)
            dacc = dot(gw.astype(xw.dtype), wproj_ref[:], tb=True)

            scores_l = []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                s = dot(qh, kh, tb=True) * scale + bias_ref[0, h]
                if with_mask:
                    s = s + mask_ref[0]
                scores_l.append(s)
            S = jnp.concatenate(scores_l, axis=0)
            m = jnp.max(S, axis=-1, keepdims=True)
            p = jnp.exp(S - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pw = p.astype(xw.dtype)

            dp_l = []
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                ph = pw[h * t:(h + 1) * t]
                acc_ref[:, h * d:(h + 1) * d] = dot(ph, vh).astype(acc_ref.dtype)
                do = dacc[:, h * d:(h + 1) * d].astype(xw.dtype)
                dp_l.append(dot(do, vh, tb=True))
                dqkv_ref[:, 2 * c + h * d:2 * c + (h + 1) * d] = (
                    dot(ph, do, ta=True)
                )
            DP = jnp.concatenate(dp_l, axis=0)
            DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
            DSw = DS.astype(xw.dtype)
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                if variant == "valacc":
                    dbias_parts[h] = dbias_parts[h] + DS[h * t:(h + 1) * t]
                else:
                    dbias_ref[0, h] += DS[h * t:(h + 1) * t]
                dsw = DSw[h * t:(h + 1) * t]
                dqkv_ref[:, h * d:(h + 1) * d] = dot(dsw, kh) * scale
                dqkv_ref[:, c + h * d:c + (h + 1) * d] = (
                    dot(dsw, qh, ta=True) * scale
                )

            if variant == "valacc":
                vacc["dwproj"] = vacc["dwproj"] + dot(
                    acc_ref[:], gw.astype(xw.dtype), ta=True)
            else:
                dwproj_ref[:] += dot(acc_ref[:], gw.astype(xw.dtype), ta=True)
            dqkv = dqkv_ref[:]
            dqkvw = dqkv.astype(xw.dtype)
            if variant == "valacc":
                vacc["dbqkv"] = vacc["dbqkv"] + jnp.sum(
                    dqkv, axis=0, keepdims=True)
                vacc["dwqkv"] = vacc["dwqkv"] + dot(xw, dqkvw, ta=True)
            else:
                dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
                dwqkv_ref[:] += dot(xw, dqkvw, ta=True)
            dx_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                dot(dqkvw, wqkv_ref[:], tb=True)
                .astype(dx_ref.dtype).reshape(wz, wh, ww, c)
            )

        if variant == "valacc":
            for h in range(heads):
                dbias_ref[0, h] += dbias_parts[h]

            @pl.when(first)
            def _():
                dwqkv_ref[:] = vacc["dwqkv"]
                dbqkv_ref[:] = vacc["dbqkv"]
                dwproj_ref[:] = vacc["dwproj"]
                dbproj_ref[:] = vacc["dbproj"]

            @pl.when(~first)
            def _():
                dwqkv_ref[:] += vacc["dwqkv"]
                dbqkv_ref[:] += vacc["dbqkv"]
                dwproj_ref[:] += vacc["dwproj"]
                dbproj_ref[:] += vacc["dbproj"]

    return kernel


def _one_window(dot, qkv, dacc, gw, bias_ref, mask_ref, acc_ref, dbias_ref,
                dwproj_ref, heads, t, c, d, scale, with_mask, _unused):
    """pair-variant per-window score path; returns the window's dqkv value."""
    dbproj_done = False  # handled by caller on the fat path
    del dbproj_done
    scores_l = []
    for h in range(heads):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, c + h * d:c + (h + 1) * d]
        s = dot(qh, kh, tb=True) * scale + bias_ref[0, h]
        if with_mask:
            s = s + mask_ref[0]
        scores_l.append(s)
    S = jnp.concatenate(scores_l, axis=0)
    m = jnp.max(S, axis=-1, keepdims=True)
    p = jnp.exp(S - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pw = p.astype(qkv.dtype)

    dv_l, dp_l = [], []
    for h in range(heads):
        vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        ph = pw[h * t:(h + 1) * t]
        acc_ref[:, h * d:(h + 1) * d] = dot(ph, vh).astype(acc_ref.dtype)
        do = dacc[:, h * d:(h + 1) * d].astype(qkv.dtype)
        dp_l.append(dot(do, vh, tb=True))
        dv_l.append(dot(ph, do, ta=True))
    DP = jnp.concatenate(dp_l, axis=0)
    DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
    DSw = DS.astype(qkv.dtype)
    dq_l, dk_l = [], []
    for h in range(heads):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, c + h * d:c + (h + 1) * d]
        dbias_ref[0, h] += DS[h * t:(h + 1) * t]
        dsw = DSw[h * t:(h + 1) * t]
        dq_l.append(dot(dsw, kh) * scale)
        dk_l.append(dot(dsw, qh, ta=True) * scale)
    dwproj_ref[:] += dot(acc_ref[:], gw.astype(qkv.dtype), ta=True)
    return jnp.concatenate(dq_l + dk_l + dv_l, axis=1)


def build_backward(x, wqkv, bqkv, wproj, bias, mask, g, window, heads, scale,
                   variant):
    from pangu_tpu.ops import fused_block_attention as fba

    if variant == "shipped":
        return fba._backward_pallas(x, wqkv, bqkv, wproj, bias, mask, g,
                                    window, heads, scale)

    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww
    grid = (zn, hn, b)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda zi, hi, bb: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    slab = pl.BlockSpec((1, wz, wh, w, c),
                        lambda zi, hi, bb: (bb, zi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, heads, t, t),
                             lambda zi, hi, bb: (zi * hn + hi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [slab, slab, const_spec(wqkv), const_spec(bqkv),
                const_spec(wproj), bias_spec]
    args = [x, g, wqkv, bqkv, wproj, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t),
                                     lambda zi, hi, bb: (zi * hn + hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)

    kernel = _make_bwd_kernel_variant(window, w, c, heads, scale,
                                      mask is not None, variant)
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct(bias.shape, jnp.float32),
    )
    out_specs = (
        slab,
        pl.BlockSpec((c, 3 * c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        bias_spec,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),
            pltpu.VMEM((t, 3 * c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


def make_inputs(stage: str):
    rng = np.random.default_rng(0)
    if stage == "outer":
        z, hp, w, c, heads = 8, 186, 360, 192, 6
    else:
        z, hp, w, c, heads = 8, 96, 180, 384, 12
    window = (2, 6, 12)
    t = 144
    zn, hn = z // 2, hp // 6
    nt = zn * hn
    x = jnp.asarray(rng.standard_normal((1, z, hp, w, c)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((1, z, hp, w, c)) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((1, 3 * c)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nt, heads, t, t)) * 0.02,
                       jnp.float32)
    scale = (c // heads) ** -0.5
    return x, wqkv, bqkv, wproj, bias, None, g, window, heads, scale


def bench_variant(variant: str, stage: str, check_against=None):
    x, wqkv, bqkv, wproj, bias, mask, g, window, heads, scale = \
        make_inputs(stage)

    fn = functools.partial(build_backward, wqkv=wqkv, bqkv=bqkv, wproj=wproj,
                           bias=bias, mask=mask, window=window, heads=heads,
                           scale=scale, variant=variant)

    outs = jax.jit(lambda x, g: fn(x, g=g))(x, g)
    outs = jax.tree.map(np.asarray, outs)
    if check_against is not None:
        ref = check_against
        names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
        for n, a, b in zip(names, outs, ref):
            a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
            denom = np.maximum(np.abs(b32).max(), 1e-6)
            rel = np.abs(a32 - b32).max() / denom
            assert rel < 2e-2, (variant, n, rel)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(x, g, steps):
        def body(carry, _):
            outs = fn(carry, g=g)
            return outs[0], jnp.float32(0)

        y, _ = jax.lax.scan(body, x, length=steps)
        return jnp.sum(y[:, 0, 0, ::100, ::100].astype(jnp.float32))

    k_short, k_long = 2, 10
    float(chain(x, g, k_short))
    float(chain(x, g, k_long))

    def once(k):
        t0 = time.perf_counter()
        float(chain(x, g, k))
        return time.perf_counter() - t0

    diffs = sorted((once(k_long) - once(k_short)) / (k_long - k_short)
                   for _ in range(5))
    return diffs[len(diffs) // 2], outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="outer", choices=["outer", "inner"])
    p.add_argument("--variants", default="shipped,valacc,pair")
    args = p.parse_args()

    import bench
    bench._enable_compile_cache()

    results = {}
    ref = None
    for v in args.variants.split(","):
        tsec, outs = bench_variant(v, args.stage, check_against=ref)
        if v == "shipped":
            ref = outs
        results[f"{v}_ms"] = round(tsec * 1e3, 2)
        print(json.dumps({"stage": args.stage, **results,
                          "device_kind": jax.devices()[0].device_kind}),
              flush=True)


if __name__ == "__main__":
    main()
