"""Shared machinery of the on-device A/B harnesses
(bench_attn_fwd_ab.py / bench_attn_bwd_ab.py).

One copy of the timing methodology: K-step ``lax.scan`` chains with an
input perturbation that defeats CSE, paired long/short-chain difference,
median of reps (the tunnel-robust scheme bench.py uses). Keeping it here
means a methodology fix lands in every harness at once instead of
silently diverging between the fwd and bwd sweeps.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp


def dot(a, b, ta=False, tb=False):
    """2D dot_general with optional transposes, f32 accumulation."""
    dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


@contextmanager
def interpret_pallas():
    """Force every pallas_call in scope into interpret mode (CPU parity
    smokes); restores the real implementation on exit."""
    from jax.experimental import pallas as pl

    real_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        kw.pop("cost_estimate", None)
        return real_call(*a, **kw)

    pl.pallas_call = interp_call
    try:
        yield
    finally:
        pl.pallas_call = real_call


def scan_timeit(call, args, body, k_short=3, k_long=13, reps=5) -> float:
    """ms per ``call`` invocation, scan-chain-amortized.

    ``body(x, rest) -> (x_next, partial_scalar)`` runs one call and derives
    the next chain input from its output (the CSE-defeating perturbation) —
    the only part that differs between harnesses. All operands are jit
    ARGUMENTS (closed-over full-geometry constants blow the remote-compile
    request cap; see bench.py).
    """

    def chain(k):
        @jax.jit
        def run(x, rest):
            def step(xc, _):
                return body(xc, rest)

            xf, partials = jax.lax.scan(step, x, None, length=k)
            return jnp.sum(partials) + jnp.sum(xf[0, 0, 0, 0, :8])

        return run

    rest = tuple(args[1:])
    f_s, f_l = chain(k_short), chain(k_long)
    float(f_s(args[0], rest))  # compile + warm
    float(f_l(args[0], rest))

    def once(f):
        t0 = time.perf_counter()
        float(f(args[0], rest))
        return time.perf_counter() - t0

    diffs = sorted(once(f_l) - once(f_s) for _ in range(reps))
    return diffs[len(diffs) // 2] / (k_long - k_short) * 1e3
