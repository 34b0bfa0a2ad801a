import os

from pangu_tpu.config import (
    ModelConfig,
    apply_overrides,
    load_config,
    pangu_pretrain,
    pangu_tiny,
    save_config,
)


def test_presets():
    cfg = pangu_pretrain(horizon=6)
    assert cfg.horizon == 6
    assert cfg.model.dims == (192, 384, 384, 192)
    tiny = pangu_tiny()
    assert tiny.model.lat < 100


def test_overrides():
    cfg = pangu_tiny()
    cfg = apply_overrides(
        cfg, ["horizon=6", "model.compute_dtype=bfloat16", "train.lr=1e-4",
              "model.depths=2,2,2,2", "train.only_wind_speed_loss=true"]
    )
    assert cfg.horizon == 6
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.train.lr == 1e-4
    assert cfg.model.depths == (2, 2, 2, 2)
    assert cfg.train.only_wind_speed_loss is True


def test_roundtrip(tmp_path):
    cfg = pangu_tiny()
    for name in ["c.json", "c.yaml"]:
        p = os.path.join(tmp_path, name)
        save_config(cfg, p)
        loaded = load_config(p)
        assert loaded.model == cfg.model
        assert loaded == cfg


def test_pretrain_horizon_data_cadence():
    """The h-hour preset trains/scores on h-hourly pairs (reference
    config_{1,3,6}.py FREQUENCY; an inverted conditional once made every
    preset daily — the 1h model saw one diurnal phase)."""
    from pangu_tpu.config import pangu_pretrain

    for h, freq in ((1, "1h"), (3, "3h"), (6, "6h"), (24, "24h")):
        d = pangu_pretrain(horizon=h).data
        assert (d.train_freq, d.val_freq, d.test_freq) == (freq,) * 3
