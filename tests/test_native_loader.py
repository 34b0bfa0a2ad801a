"""Native C++ batch loader: parity with numpy, error paths, and the
NpyStore-backed fast batch path."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from pangu_tpu.data.dataset import BatchLoader, Era5Dataset, NpyStore
from pangu_tpu.data.native_loader import (
    native_available,
    read_batch,
    read_npy,
)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    store = NpyStore(str(d))
    t0 = datetime(2018, 1, 1)
    for i in range(6):
        t = t0 + timedelta(hours=24 * i)
        store.save(
            t,
            rng.standard_normal((2, 3, 8, 16)).astype(np.float32),
            rng.standard_normal((2, 8, 16)).astype(np.float32),
        )
    return str(d)


def test_native_builds():
    assert native_available(), "g++ toolchain present; native build must work"


def test_read_parity(tmp_path):
    a = np.random.default_rng(1).standard_normal((4, 9, 130)).astype(np.float32)
    p = str(tmp_path / "x.npy")
    np.save(p, a)
    out = np.empty(a.size, np.float32)
    n = read_npy(p, out)
    assert n == a.size
    np.testing.assert_array_equal(out.reshape(a.shape), a)


def test_read_f64_converts(tmp_path):
    a = np.random.default_rng(2).standard_normal((5, 7)).astype(np.float64)
    p = str(tmp_path / "d.npy")
    np.save(p, a)
    out = np.empty(a.size, np.float32)
    read_npy(p, out)
    np.testing.assert_allclose(out.reshape(a.shape), a.astype(np.float32))


def test_errors(tmp_path):
    out = np.empty(8, np.float32)
    if not native_available():
        pytest.skip("numpy fallback raises different errors")
    with pytest.raises(IOError, match="cannot open"):
        read_npy(str(tmp_path / "missing.npy"), out)
    big = np.zeros((100,), np.float32)
    p = str(tmp_path / "big.npy")
    np.save(p, big)
    with pytest.raises(IOError, match="buffer too small"):
        read_npy(p, out)
    # unsupported dtype
    np.save(str(tmp_path / "int.npy"), np.zeros((4,), np.int32))
    with pytest.raises(IOError, match="dtype"):
        read_npy(str(tmp_path / "int.npy"), np.empty(4, np.float32))


def test_batch_read(tmp_path):
    rng = np.random.default_rng(3)
    arrs = [rng.standard_normal((3, 5, 130)).astype(np.float32) for _ in range(5)]
    paths = []
    for i, a in enumerate(arrs):
        p = str(tmp_path / f"b{i}.npy")
        np.save(p, a)
        paths.append(p)
    out = np.empty((5,) + arrs[0].shape, np.float32)
    read_batch(paths, out, threads=4)
    for i in range(5):
        np.testing.assert_array_equal(out[i], arrs[i])


def test_npystore_batch_path_matches_scalar_path(npy_dir):
    ds = Era5Dataset(NpyStore(npy_dir), "20180101", "20180106", "24h", 24)
    loader = BatchLoader(ds, batch_size=2, prefetch=0)
    batch, periods = next(iter(loader))
    # compare against per-sample loads
    u0, s0, tu0, ts0, p0 = ds[0]
    np.testing.assert_array_equal(np.asarray(batch.upper[0]), u0)
    np.testing.assert_array_equal(np.asarray(batch.target_surface[0]), ts0)
    assert periods[0] == p0
