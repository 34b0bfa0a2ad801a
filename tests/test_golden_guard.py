"""Standing golden-value guard for the full model forward.

The strongest parity evidence is the opt-in full-geometry run
(tests/test_full_model_parity.py, ~30-60 min); this is its CHEAP standing
proxy (VERDICT r2 #3): a tiny-geometry full-model forward on fixed-seed
weights and inputs, compared against committed golden values. The
per-layer live-torch parity tests (tests/test_parity_reference.py) pin each
layer to the reference; this guard pins the COMPOSITION — stage handoffs,
skip concat, pad/crop wiring — so a wiring regression is caught in seconds
without the hour-long run.

Refresh after an intentional numerics change:
    GOLDEN_REFRESH=1 python -m pytest tests/test_golden_guard.py -q
then re-run the full parity test once to re-anchor against the reference.
"""

import os

import numpy as np
import pytest

import jax

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import pangu_tiny
from pangu_tpu.model import PanguModel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_forward.npz")


def _compute():
    cfg = pangu_tiny()  # fp32, HIGHEST matmul precision
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(20260817)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)
    out_u, out_s = jax.jit(
        lambda p, u, s: model.apply(p, u, s, aux, True)
    )(params, upper, surface)
    return np.asarray(out_u), np.asarray(out_s)


def test_tiny_forward_matches_golden():
    out_u, out_s = _compute()
    if os.environ.get("GOLDEN_REFRESH") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, upper=out_u, surface=out_s)
        if os.environ.get("GOLDEN_REFRESH") != "1":
            pytest.fail(
                f"golden file was missing — wrote {GOLDEN}; commit it and "
                f"re-run (a missing golden must never silently pass)"
            )
        return
    g = np.load(GOLDEN)
    for got, name in ((out_u, "upper"), (out_s, "surface")):
        ref = g[name]
        scale = np.abs(ref).max() + 1e-12
        diff = np.abs(got - ref).max()
        # fp32/HIGHEST is deterministic on one host; the tolerance absorbs
        # XLA-version reassociation drift, nothing more
        assert diff / scale < 1e-4, (
            f"{name} drifted from golden: max|diff|={diff:.3e} "
            f"(scale {scale:.3e}) — if intentional, GOLDEN_REFRESH=1 and "
            f"re-anchor with RUN_FULL_PARITY=1"
        )
