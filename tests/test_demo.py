"""Demo entry point (reference demo/app.py — simulated-data Streamlit app).

Ours additionally drives real checkpoints through the shared CLI flags; both
modes are exercised here via the headless HTML fallback.
"""

import os
import sys

import numpy as np
import pytest


def _run_demo(tmp_path, argv):
    import importlib

    mod = importlib.import_module("demo.app")
    old = sys.argv
    sys.argv = ["demo/app.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def repo_on_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)


def test_demo_headless_synthetic(tmp_path, repo_on_path):
    out = tmp_path / "rep"
    _run_demo(tmp_path, ["--steps", "1", "--out", str(out)])
    html = (out / "index.html").read_text()
    assert html.count("<img") >= 1  # one panel per surface variable


def test_demo_headless_real_weights(tmp_path, repo_on_path):
    """--weights routes through cli.load_model_and_params (npz branch)."""
    import jax

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_tiny
    from pangu_tpu.interop.npz_io import save_params_npz
    from pangu_tpu.model import PanguModel

    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    u = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    s = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(3), u, s, aux)
    ckpt = tmp_path / "tiny.npz"
    save_params_npz(str(ckpt), params)

    out = tmp_path / "rep_w"
    _run_demo(tmp_path, ["--steps", "1", "--weights", str(ckpt),
                         "--out", str(out)])
    assert (out / "index.html").exists()
