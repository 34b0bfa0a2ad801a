"""Metric parity: numpy cross-check + golden parity vs the reference's
torch.jit scorers (reference era5_data/score.py)."""

import numpy as np
import pytest

from pangu_tpu import metrics
from tests.conftest import requires_reference


def _np_lat_weights(num_lat):
    j = np.arange(num_lat)
    lat = 90.0 - j * 180.0 / (num_lat - 1)
    cos = np.cos(3.1416 / 180.0 * lat)
    return num_lat * cos / cos.sum()


def test_rmse_matches_numpy(rng):
    pred = rng.standard_normal((3, 33, 64)).astype(np.float32)
    tgt = rng.standard_normal((3, 33, 64)).astype(np.float32)
    w = _np_lat_weights(33).reshape(1, 33, 1)
    expected = np.sqrt(np.mean(w * (pred - tgt) ** 2, axis=(-1, -2)))
    got = np.asarray(metrics.weighted_rmse_channels(pred, tgt))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_acc_matches_numpy(rng):
    pred = rng.standard_normal((2, 5, 33, 64)).astype(np.float32)
    tgt = rng.standard_normal((2, 5, 33, 64)).astype(np.float32)
    w = _np_lat_weights(33).reshape(1, 1, 33, 1)
    num = np.sum(w * pred * tgt, axis=(-1, -2))
    den = np.sqrt(
        np.sum(w * pred * pred, axis=(-1, -2)) * np.sum(w * tgt * tgt, axis=(-1, -2))
    )
    got = np.asarray(metrics.weighted_acc_channels(pred, tgt))
    np.testing.assert_allclose(got, num / den, rtol=1e-5)


def test_masked_rmse_reduces_to_unmasked(rng):
    pred = rng.standard_normal((4, 33, 64)).astype(np.float32)
    tgt = rng.standard_normal((4, 33, 64)).astype(np.float32)
    ones = np.ones((33, 64), np.float32)
    full = np.asarray(metrics.weighted_rmse_channels(pred, tgt))
    masked = np.asarray(metrics.weighted_rmse_channels_masked(pred, tgt, ones))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_wind_speed(rng):
    u = rng.standard_normal((2, 8, 8)).astype(np.float32)
    v = rng.standard_normal((2, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(metrics.wind_speed(u, v)), np.sqrt(u**2 + v**2), rtol=1e-6
    )


@requires_reference
def test_rmse_acc_parity_with_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from era5_data import score

    # OWN deterministic stream (not the shared session fixture): the data
    # must not depend on how many earlier tests drew from the fixture, or
    # adding a test elsewhere can shift this one onto a harder draw.
    rng = np.random.default_rng(20260817)
    pred = rng.standard_normal((13, 181, 360)).astype(np.float32)
    tgt = rng.standard_normal((13, 181, 360)).astype(np.float32)

    ref_rmse = score.weighted_rmse_torch_channels(
        torch.from_numpy(pred), torch.from_numpy(tgt)
    ).numpy()
    got_rmse = np.asarray(metrics.weighted_rmse_channels(pred, tgt))
    np.testing.assert_allclose(got_rmse, ref_rmse, rtol=2e-5)

    ref_acc = score.weighted_acc_torch_channels(
        torch.from_numpy(pred), torch.from_numpy(tgt)
    ).numpy()
    got_acc = np.asarray(metrics.weighted_acc_channels(pred, tgt))
    # ACC of uncorrelated random fields is ~0: fp32 summation-order noise is
    # absolute, so a pure-relative tolerance is ill-posed here (observed
    # ~1e-8 absolute differences failing rtol on ~1e-5 values).
    np.testing.assert_allclose(got_acc, ref_acc, rtol=2e-5, atol=1e-7)

    mask = (rng.uniform(size=(181, 360)) > 0.4).astype(np.float32)
    ref_m = score.weighted_rmse_torch_channels(
        torch.from_numpy(pred), torch.from_numpy(tgt), torch.from_numpy(mask)
    ).numpy()
    got_m = np.asarray(metrics.weighted_rmse_channels_masked(pred, tgt, mask))
    np.testing.assert_allclose(got_m, ref_m, rtol=2e-5)


def test_masked_acc_reduces_to_unmasked(rng):
    from pangu_tpu.metrics import (
        weighted_acc_channels,
        weighted_acc_masked_channels,
    )

    a = rng.standard_normal((3, 8, 16)).astype(np.float32)
    b = rng.standard_normal((3, 8, 16)).astype(np.float32)
    full = np.ones((8, 16), np.float32)
    np.testing.assert_allclose(
        np.asarray(weighted_acc_masked_channels(a, b, full)),
        np.asarray(weighted_acc_channels(a, b)), rtol=1e-6)
    # a real mask must CHANGE the score (region != globe)
    half = full.copy()
    half[:, 8:] = 0.0
    assert not np.allclose(
        np.asarray(weighted_acc_masked_channels(a, b, half)),
        np.asarray(weighted_acc_channels(a, b)))


def test_region_mask_applies_to_acc_and_rmse(rng):
    """make_field_scorer must score BOTH metric families over the region —
    a masked RMSE next to a global ACC silently mixes scopes."""
    import dataclasses

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_tiny
    from pangu_tpu.eval.evaluate import make_field_scorer

    cfg = pangu_tiny()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                use_custom_mask=True))
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    mask = np.zeros((m.lat, m.lon), np.float32)
    mask[10:20, 30:60] = 1.0
    aux.custom_mask = mask
    aux_global = synthetic_aux_constants(m, cfg.train)
    aux_global.custom_mask = np.ones((m.lat, m.lon), np.float32)

    ou = rng.standard_normal((m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    os_ = rng.standard_normal((m.surface_vars, m.lat, m.lon)).astype(np.float32)
    tu = ou + 0.1 * rng.standard_normal(ou.shape).astype(np.float32)
    ts = os_ + 0.1 * rng.standard_normal(os_.shape).astype(np.float32)

    scorer = make_field_scorer(cfg)
    region = {k: np.asarray(v) for k, v in scorer(ou, os_, tu, ts, aux).items()}
    full = {k: np.asarray(v) for k, v in
            scorer(ou, os_, tu, ts, aux_global).items()}
    for fam in ("rmse_upper_z", "acc_upper_z", "acc_surface"):
        assert not np.allclose(region[fam], full[fam]), fam
