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
