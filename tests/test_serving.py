import numpy as np
import pytest

import jax

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import pangu_tiny
from pangu_tpu.model import PanguModel
from pangu_tpu.serving import (
    export_forecast_step,
    load_forecast_step,
    make_serving_fn,
)


def test_export_roundtrip(tmp_path):
    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)
    ).astype(np.float32)
    surface = rng.standard_normal((1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)

    path = str(tmp_path / "pangu_tiny.bin")
    export_forecast_step(model, params, aux, path)
    step = load_forecast_step(path)

    got_u, got_s = step(upper, surface)
    ref_u, ref_s = jax.jit(make_serving_fn(model, params, aux))(upper, surface)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-5)
    # physical-unit outputs feed back as inputs (autoregressive serving)
    got_u2, got_s2 = step(got_u, got_s)
    assert np.isfinite(np.asarray(got_u2)).all()


def test_export_model_cli(tmp_path, monkeypatch):
    """scripts/export_model.py: checkpoint -> artifact -> load-back check."""
    import importlib
    import sys

    from pangu_tpu.interop.npz_io import save_params_npz

    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    u = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    s = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(1), u, s, aux)
    ckpt = tmp_path / "tiny.npz"
    save_params_npz(str(ckpt), params)

    out = tmp_path / "tiny_serving.bin"
    monkeypatch.setattr(sys, "argv", [
        "export_model.py", "--preset", "tiny", "--weights", str(ckpt),
        "--out-file", str(out),
    ])
    import os

    spec = importlib.util.spec_from_file_location(
        "export_model_cli",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "export_model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()  # includes the load-back smoke check
    assert out.exists() and out.stat().st_size > 0

    # the artifact serves without model code: fresh load, real inputs
    from pangu_tpu.serving import load_forecast_step

    step = load_forecast_step(str(out))
    ou, os_ = step(u, s)
    assert np.isfinite(np.asarray(ou)).all()
