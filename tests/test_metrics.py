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
