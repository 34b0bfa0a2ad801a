import os

import numpy as np
import pytest

import jax

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import DataConfig, pangu_tiny
from pangu_tpu.data import make_loader
from pangu_tpu.eval import evaluate
from pangu_tpu.eval.csv_io import load_error_scores, save_error_scores
from pangu_tpu.model import PanguModel


def test_csv_roundtrip(tmp_path):
    scores = {
        "upper_z": {"2018010100": np.arange(13.0), "2018010200": np.arange(13.0) + 1},
        "surface": {"2018010100": np.arange(4.0), "2018010200": np.arange(4.0) * 2},
        "surface_wind_speed": {"2018010100": np.array([1.5]), "2018010200": np.array([2.5])},
    }
    save_error_scores(str(tmp_path), scores, "rmse")
    df = load_error_scores(str(tmp_path), "rmse", "upper_z")
    assert list(df.columns) == [
        "1000", "925", "850", "700", "600", "500", "400", "300", "250", "200",
        "150", "100", "50",
    ]
    assert df.shape == (2, 13)
    df_s = load_error_scores(str(tmp_path), "rmse", "surface")
    assert list(df_s.columns) == ["msl", "u10", "v10", "t2m"]
    df_w = load_error_scores(str(tmp_path), "rmse", "surface_wind_speed")
    assert list(df_w.columns) == ["wind_speed"]


def test_evaluate_writes_scores(tmp_path):
    cfg = pangu_tiny().replace(
        data=DataConfig(
            test_start="20180101", test_end="20180105", test_freq="24h",
            prefetch=0,
        )
    )
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    m = cfg.model
    upper = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    surface = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)

    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, batch_size=1)
    loss = evaluate(model, params, loader, aux, cfg, str(tmp_path), visualize=True)
    assert np.isfinite(loss)

    csv = os.path.join(tmp_path, "csv")
    for fam in ["upper_z", "upper_q", "upper_t", "upper_u", "upper_v",
                "upper_wind_speed", "surface", "surface_wind_speed"]:
        assert os.path.exists(os.path.join(csv, f"rmse_{fam}.csv")), fam
    for fam in ["upper_z", "surface"]:
        assert os.path.exists(os.path.join(csv, f"acc_{fam}.csv")), fam

    df = load_error_scores(csv, "rmse", "upper_z")
    assert df.shape[0] == len(loader)
    assert (df.values > 0).all()
    # ACC is a correlation: bounded by 1
    df_acc = load_error_scores(csv, "acc", "upper_z")
    assert (df_acc.values <= 1.0 + 1e-5).all()
    # visualization wrote pngs
    pngs = os.listdir(os.path.join(tmp_path, "png"))
    assert any(p.endswith(".png") for p in pngs)


def test_evaluate_scores_every_batch_sample(tmp_path):
    """At eval batch > 1, EVERY sample must land in the score tables —
    scoring only batch element 0 silently dropped half the test set
    (round-3 verdict; reference models/pangu_sample.py only runs batch 1)."""
    cfg = pangu_tiny().replace(
        data=DataConfig(
            test_start="20180101", test_end="20180106", test_freq="24h",
            prefetch=0,
        ),
    )
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    m = cfg.model
    upper = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    surface = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)

    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, batch_size=2)
    n_samples = len(loader) * 2
    assert len(loader) == 2  # 4 samples -> 2 full batches of 2
    loss = evaluate(model, params, loader, aux, cfg, str(tmp_path))
    assert np.isfinite(loss)

    csv = os.path.join(tmp_path, "csv")
    df = load_error_scores(csv, "rmse", "upper_z")
    # one row per SAMPLE (distinct target times), not per batch
    assert df.shape[0] == n_samples
    assert df.index.nunique() == n_samples
    # different targets score differently — catches broadcasting one
    # sample's scores across the batch
    assert not np.allclose(df.values[0], df.values[1])


def test_evaluate_empty_window_is_loud_nan(tmp_path, caplog):
    """A test range too narrow to contain any (input, +horizon target) pair
    must NOT read as a perfect 0.0 test loss — it returns NaN and warns."""
    cfg = pangu_tiny().replace(
        data=DataConfig(
            test_start="20180101", test_end="20180102", test_freq="24h",
            prefetch=0,
        )
    )
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    m = cfg.model
    upper = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    surface = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)

    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, batch_size=1)
    assert len(loader) == 0
    with caplog.at_level("WARNING"):
        loss = evaluate(model, params, loader, aux, cfg, str(tmp_path))
    assert np.isnan(loss)
    assert any("ZERO scoreable samples" in r.message for r in caplog.records)
