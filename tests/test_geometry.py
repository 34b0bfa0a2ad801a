"""Geometry must reproduce the reference's hard-coded constants
(reference models/layers.py:180-185,347-350 and SURVEY §2.1 invariants)."""

from pangu_tpu.config import ModelConfig, pangu_tiny
from pangu_tpu.geometry import compute_geometry


def test_pretrained_geometry():
    g = compute_geometry(ModelConfig())
    assert g.lat_pad == 3  # 721 -> 724
    assert g.level_pad == 1  # 13 -> 14
    assert (g.z, g.h, g.w) == (8, 181, 360)
    assert g.z_upper == 7
    assert (g.h_down_pad, g.h2, g.w2) == (1, 91, 180)

    assert g.outer.h_pad == 186
    assert g.outer.n_lon_windows == 30
    assert g.outer.n_type_windows == 124  # (8/2)*(186/6)
    assert g.outer.tokens_per_window == 144
    assert g.outer.num_tokens == 8 * 181 * 360  # 521280

    assert g.inner.h_pad == 96
    assert g.inner.n_lon_windows == 15
    assert g.inner.n_type_windows == 64  # (8/2)*(96/6)


def test_tiny_geometry_exercises_all_pads():
    g = compute_geometry(pangu_tiny().model)
    assert g.lat_pad > 0 and g.level_pad > 0 and g.h_down_pad > 0
    assert g.outer.h_pad > g.outer.h
    assert g.inner.h_pad > g.inner.h
    assert g.inner.h_pad > g.cfg.window[1]  # non-degenerate shift mask
