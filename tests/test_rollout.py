"""Rollout engine tests on tiny geometry with synthetic data."""

import os
from datetime import datetime

import numpy as np
import pytest

import jax

from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.config import DataConfig, pangu_tiny
from pangu_tpu.data import Era5Dataset, SyntheticStore, make_loader
from pangu_tpu.model import PanguModel
from pangu_tpu.rollout import (
    ModelBundle,
    hierarchical_forecast,
    iterative_eval,
    multi_output_rollout,
    single_output_eval,
)
from pangu_tpu.rollout.aggregate import write_aggregates
from pangu_tpu.rollout.autoregressive import make_forecast_step, rollout_scan
from pangu_tpu.rollout.engines import mix24_rule


@pytest.fixture(scope="module")
def setup():
    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    m = cfg.model
    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)
    ).astype(np.float32)
    surface = rng.standard_normal((1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), upper, surface, aux)
    return cfg, model, params, aux, upper, surface


def test_forecast_step_shapes(setup):
    cfg, model, params, aux, upper, surface = setup
    step = make_forecast_step(model, donate=False)
    u, s = step(params, upper, surface, aux)
    assert u.shape == upper.shape and s.shape == surface.shape


def test_rollout_scan_matches_loop(setup):
    cfg, model, params, aux, upper, surface = setup
    traj_u, traj_s = rollout_scan(model, params, upper, surface, aux, steps=3)
    assert traj_u.shape[0] == 3

    step = make_forecast_step(model, donate=False)
    u, s = upper, surface
    for i in range(3):
        u, s = step(params, u, s, aux)
        np.testing.assert_allclose(
            np.asarray(traj_u[i]), np.asarray(u), atol=2e-4
        )


def test_single_output_eval(setup, tmp_path):
    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(data=DataConfig(
        test_start="20180101", test_end="20180105", test_freq="24h", prefetch=0,
    ))
    bundle = ModelBundle(model, params, aux, cfg.horizon)
    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, 1)
    single_output_eval(bundle, loader, cfg, str(tmp_path))
    assert os.path.exists(tmp_path / "csv" / "rmse_upper_z.csv")
    assert os.path.exists(tmp_path / "csv" / "acc_surface.csv")


def test_multi_output_rollout_and_aggregate(setup, tmp_path):
    cfg, model, params, aux, *_ = setup
    store = SyntheticStore(cfg.model)
    ds = Era5Dataset(store, "20180101", "20180110", "24h", 24)
    bundles = {24: ModelBundle(model, params, aux, 24)}
    res = str(tmp_path / "rollout")
    multi_output_rollout(bundles, ds, cfg, res, base_horizon=24, lead_days=3)

    init_dirs = sorted(os.listdir(res))
    assert len(init_dirs) >= 2
    first = os.path.join(res, init_dirs[0], "csv")
    assert os.path.exists(os.path.join(first, "rmse_surface_wind_speed.csv"))

    agg = write_aggregates(res, str(tmp_path / "agg"), plot=True)
    assert set(agg.columns) == {"forecast_hour", "mean", "std", "count"}
    assert agg["forecast_hour"].tolist() == [24, 48, 72]
    assert os.path.exists(tmp_path / "agg" / "rmse_surface_wind_speed_by_hour.png")


def test_single_output_eval_multi_step(setup, tmp_path):
    """steps = horizon // test_freq autoregressive applications (reference
    inference_singleOutput.py:141-153): 24h horizon sampled at 12h -> 2 steps,
    and the scored frame is the 2-step forecast, not the 1-step one."""
    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(data=DataConfig(
        test_start="20180101", test_end="20180103", test_freq="12h",
        prefetch=0,
    ))
    bundle = ModelBundle(model, params, aux, cfg.horizon)

    res1, res2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, 1)
    single_output_eval(bundle, loader, cfg, res1, steps=1)
    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, 1)
    single_output_eval(bundle, loader, cfg, res2,
                       steps=cfg.horizon // 12)

    import pandas as pd
    a = pd.read_csv(os.path.join(res1, "csv", "rmse_surface.csv"), index_col=0)
    b = pd.read_csv(os.path.join(res2, "csv", "rmse_surface.csv"), index_col=0)
    assert list(a.index) == list(b.index)
    assert not np.allclose(a.values, b.values)


def test_single_output_lead_time_quirk_warning(setup, tmp_path, caplog):
    """test_freq < horizon logs the physical lead next to the recorded label
    (round-4 verdict #6); the physically-labeled steps=1 path stays quiet."""
    import logging

    cfg, model, params, aux, *_ = setup
    cfg = cfg.replace(data=DataConfig(
        test_start="20180101", test_end="20180103", test_freq="12h",
        prefetch=0,
    ))
    bundle = ModelBundle(model, params, aux, cfg.horizon)

    with caplog.at_level(logging.WARNING, logger="pangu_tpu.rollout"):
        loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, 1)
        single_output_eval(bundle, loader, cfg, str(tmp_path / "q"),
                           steps=cfg.horizon // 12)
    msgs = [r.message for r in caplog.records if "lead-time quirk" in r.message]
    assert len(msgs) == 1
    assert f"{(cfg.horizon // 12) * cfg.horizon}h" in msgs[0]  # physical lead
    assert f"t+{cfg.horizon}h label" in msgs[0]                # recorded label

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="pangu_tpu.rollout"):
        loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon, 1)
        single_output_eval(bundle, loader, cfg, str(tmp_path / "ok"), steps=1)
    assert not [r for r in caplog.records if "lead-time quirk" in r.message]


def test_multi_output_rollout_strict_alignment(setup, tmp_path):
    """Frames that fall between dataset keys raise instead of silently
    truncating the CSVs (reference alignment assert,
    inference_multiOutput.py:197); tail inits whose window runs past the
    range end are skipped with a warning, not scored partially."""
    cfg, model, params, aux, *_ = setup
    store = SyntheticStore(cfg.model)
    bundles = {24: ModelBundle(model, params, aux, 24)}

    # 48h-cadence dataset: rollout frames at +24h have no ground truth
    ds_sparse = Era5Dataset(store, "20180101", "20180109", "48h", 24)
    with pytest.raises(ValueError, match="no ground truth"):
        multi_output_rollout(bundles, ds_sparse, cfg,
                             str(tmp_path / "sparse"), base_horizon=24,
                             lead_days=2)

    # tail init (0104) would need GT at 0107 beyond the range end 0106: it
    # must be skipped entirely (no partial CSV dir), earlier inits scored
    ds = Era5Dataset(store, "20180101", "20180106", "24h", 24)
    res = str(tmp_path / "tail")
    multi_output_rollout(bundles, ds, cfg, res, base_horizon=24, lead_days=3)
    init_dirs = sorted(os.listdir(res))
    assert init_dirs == ["2018010100", "2018010200", "2018010300"]
    import pandas as pd
    first = pd.read_csv(os.path.join(res, init_dirs[0], "csv",
                                     "rmse_surface.csv"), index_col=0)
    assert len(first) == 3  # all three lead frames scored, none dropped


def test_iterative_eval_scores_all_inits(setup, tmp_path):
    """--mode iterative parity fix: every qualifying init is rolled through
    the ladder and hours 24..48 are scored against GT (2+ inits)."""
    cfg, model, params, aux, *_ = setup
    store = SyntheticStore(cfg.model)
    ds = Era5Dataset(store, "20180101", "20180105", "24h", 24)
    bundles = {h: ModelBundle(model, params, aux, h) for h in (24, 6)}

    res = str(tmp_path / "iter")
    iterative_eval(bundles, ds, cfg, res)

    init_dirs = sorted(d for d in os.listdir(res) if d.startswith("2018"))
    assert len(init_dirs) >= 2
    import pandas as pd
    t = pd.read_csv(os.path.join(res, init_dirs[0], "csv",
                                 "rmse_upper_z.csv"), index_col=0)
    # 24h-cadence GT verifies hours 24 and 48 of the ladder
    assert len(t) == 2


def test_mix24_rule():
    rule3 = mix24_rule(3)
    assert rule3(datetime(2018, 1, 2, 0)) == 24
    assert rule3(datetime(2018, 1, 2, 6)) == 6
    assert rule3(datetime(2018, 1, 2, 12)) == 6
    assert rule3(datetime(2018, 1, 2, 9)) == 3
    rule6 = mix24_rule(6)
    assert rule6(datetime(2018, 1, 2, 0)) == 24
    assert rule6(datetime(2018, 1, 2, 6)) == 6


def test_hierarchical_forecast(setup, tmp_path):
    cfg, model, params, aux, upper, surface = setup
    # one bundle per horizon (same weights — structure is what's under test)
    bundles = {h: ModelBundle(model, params, aux, h) for h in (24, 6, 3, 1)}
    preds = hierarchical_forecast(
        bundles, datetime(2018, 1, 1), upper[0], surface[0],
        spill_dir=str(tmp_path / "spill"),
    )
    assert sorted(preds) == list(range(24, 49))
    u24, s24 = preds[24]
    assert u24.shape == upper[0].shape
    # greedy ladder: hour 30 must come from the 6h model applied to hour 24
    b6 = bundles[6]
    u_direct, s_direct = b6.forecast_step()(params, u24[None], s24[None], aux)
    np.testing.assert_allclose(preds[30][0], np.asarray(u_direct)[0], atol=2e-4)
    # with spill_dir the mapping must stay LAZY: spilled entries are paths
    # until accessed (eager loading would pull the whole ladder back into
    # host memory at once and defeat the spill)
    spilled = [v for v in preds._entries.values() if isinstance(v, str)]
    assert spilled, "spill_dir set but nothing was spilled"
    assert all(os.path.exists(p) for p in spilled)


def test_score_bundle_side_by_side(setup, tmp_path):
    """Mixed evaluation (reference inference_mix_multiOutput.py): one model
    drives the state, a second model's outputs are what gets scored."""
    import jax

    from pangu_tpu.rollout.engines import _new_score_dicts  # noqa: F401

    cfg, model, params, aux, *_ = setup
    # a second model with different params
    params2 = jax.tree.map(lambda x: x * 1.05, params)
    store = SyntheticStore(cfg.model)
    ds = Era5Dataset(store, "20180101", "20180106", "24h", 24)
    driver = {24: ModelBundle(model, params, aux, 24)}
    scoreb = ModelBundle(model, params2, aux, 24)

    res_a = str(tmp_path / "plain")
    res_b = str(tmp_path / "scored")
    multi_output_rollout(driver, ds, cfg, res_a, base_horizon=24, lead_days=2)
    multi_output_rollout(driver, ds, cfg, res_b, base_horizon=24, lead_days=2,
                         score_bundle=scoreb)

    import pandas as pd

    init = sorted(os.listdir(res_a))[0]
    a = pd.read_csv(os.path.join(res_a, init, "csv", "rmse_surface.csv"), index_col=0)
    b = pd.read_csv(os.path.join(res_b, init, "csv", "rmse_surface.csv"), index_col=0)
    # different model scored -> different numbers, same rows
    assert list(a.index) == list(b.index)
    assert not np.allclose(a.values, b.values)


def test_bundle_commits_numpy_trees_to_device(setup):
    """ModelBundle must device_put params/aux once at construction: numpy
    arguments to a jitted forecast step are re-transferred on EVERY call
    (~1.1 GB/step for pretrained weights loaded from .npz/.pth)."""
    cfg, model, params, aux, upper, surface = setup
    np_params = jax.tree.map(np.asarray, params)
    np_aux = jax.tree.map(np.asarray, aux)
    bundle = ModelBundle(model, np_params, np_aux, cfg.horizon)
    for leaf in jax.tree.leaves(bundle.params):
        assert isinstance(leaf, jax.Array)
    for leaf in jax.tree.leaves(bundle.aux):
        assert isinstance(leaf, jax.Array)


def test_hierarchical_missing_24h_bundle(setup):
    """Without the 24h model the 6h ladder must CHAIN exact applications
    (0->6->...->24), not mislabel one application as +24h; and the missing
    bundle must not raise (reference inference_iterative.py requires all
    four models, ours degrades gracefully)."""
    cfg, model, params, aux, upper, surface = setup
    bundles = {6: ModelBundle(model, params, aux, 6)}
    preds = hierarchical_forecast(
        bundles, datetime(2018, 1, 1), upper[0], surface[0], hours=(24, 30))
    assert sorted(h for h in preds) == [24, 30]
    # ground truth: five manual 6h applications from the analysis
    step = bundles[6].forecast_step()
    u, s = upper, surface
    for _ in range(5):
        u, s = step(params, u, s, aux)
    np.testing.assert_allclose(preds[30][0], np.asarray(u)[0], atol=2e-4)


def test_single_output_eval_scores_every_batch_sample(setup, tmp_path):
    """batch_size > 1: one CSV row per SAMPLE, not per batch."""
    import pandas as pd

    cfg, model, params, aux, *_ = setup
    store = SyntheticStore(cfg.model)
    ds = Era5Dataset(store, "20180101", "20180110", "24h", 24)
    loader = make_loader(
        DataConfig(test_start="20180101", test_end="20180110",
                   test_freq="24h", prefetch=0),
        cfg.model, "test", 24, batch_size=2)
    bundle = ModelBundle(model, params, aux, 24)
    single_output_eval(bundle, loader, cfg, str(tmp_path))
    csv = next((tmp_path / "csv").glob("rmse_surface*.csv"))
    rows = pd.read_csv(csv, index_col=0)
    assert len(rows) == len(ds) - (len(ds) % 2)  # all full-batch samples
