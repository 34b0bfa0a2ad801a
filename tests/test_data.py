import numpy as np
import pytest

from pangu_tpu.config import DataConfig, pangu_tiny
from pangu_tpu.data import BatchLoader, Era5Dataset, NpyStore, SyntheticStore, make_loader


@pytest.fixture(scope="module")
def tiny_model():
    return pangu_tiny().model


def _data_cfg(**kw):
    base = dict(
        train_start="20180101", train_end="20180201", train_freq="24h",
        val_start="20180201", val_end="20180210", val_freq="24h",
        test_start="20180210", test_end="20180220", test_freq="24h",
        prefetch=0,
    )
    base.update(kw)
    return DataConfig(**base)


def test_length_rule(tiny_model):
    """len = len(keys) - horizon // freq_hours - 1 (reference
    era5_data/utils_data.py:106)."""
    store = SyntheticStore(tiny_model)
    ds = Era5Dataset(store, "20180101", "20180201", "24h", horizon=24)
    assert len(ds.keys) == 32
    assert len(ds) == 32 - 24 // 24 - 1

    ds6 = Era5Dataset(store, "20180101", "20180102", "6h", horizon=24)
    assert len(ds6.keys) == 5
    assert len(ds6) == 5 - 24 // 6 - 1


def test_sample_shapes_and_horizon(tiny_model):
    m = tiny_model
    ds = Era5Dataset(SyntheticStore(m), "20180101", "20180201", "24h", 24)
    u, s, tu, ts, periods = ds[0]
    assert u.shape == (m.upper_vars, m.levels, m.lat, m.lon)
    assert s.shape == (m.surface_vars, m.lat, m.lon)
    assert periods == ("2018010100", "2018010200")
    # target equals store at t+24h
    u2, s2 = ds.store.load(ds.keys[1])
    np.testing.assert_array_equal(tu, u2)


def test_synthetic_deterministic(tiny_model):
    s1 = SyntheticStore(tiny_model, seed=3)
    s2 = SyntheticStore(tiny_model, seed=3)
    from datetime import datetime

    t = datetime(2020, 5, 1, 12)
    np.testing.assert_array_equal(s1.load(t)[0], s2.load(t)[0])


def test_npy_store_roundtrip(tiny_model, tmp_path):
    from datetime import datetime

    store = NpyStore(str(tmp_path))
    t = datetime(2018, 1, 1, 0)
    u = np.random.default_rng(0).standard_normal((2, 3, 4, 5)).astype(np.float32)
    s = np.random.default_rng(1).standard_normal((2, 4, 5)).astype(np.float32)
    store.save(t, u, s)
    u2, s2 = store.load(t)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(s, s2)


def test_loader_sharding(tiny_model):
    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180301", "24h", 24)
    all_periods = []
    for shard in range(2):
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=5,
                             num_shards=2, shard=shard, prefetch=0)
        for batch, periods in loader:
            assert batch.upper.shape[0] == 2
            all_periods.extend(p[0] for p in periods)
    # shards are disjoint
    assert len(all_periods) == len(set(all_periods))


def test_loader_prefetch_matches_sync(tiny_model):
    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180120", "24h", 24)
    sync = BatchLoader(ds, 2, shuffle=True, seed=1, prefetch=0)
    pre = BatchLoader(ds, 2, shuffle=True, seed=1, prefetch=2)
    got_s = [(b.upper.sum(), p) for b, p in sync]
    got_p = [(b.upper.sum(), p) for b, p in pre]
    assert [p for _, p in got_s] == [p for _, p in got_p]
    np.testing.assert_allclose([x for x, _ in got_s], [x for x, _ in got_p])


def test_loader_accumulation_axis(tiny_model):
    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180301", "24h", 24)
    loader = BatchLoader(ds, batch_size=2, accumulation=3, prefetch=0)
    batch, periods = next(iter(loader))
    assert batch.upper.shape[:2] == (3, 2)
    assert len(periods) == 6


def test_make_loader_synthetic(tiny_model):
    cfg = _data_cfg()
    loader = make_loader(cfg, tiny_model, "train", horizon=24, batch_size=1)
    n = 0
    for batch, _ in loader:
        n += 1
    assert n == len(loader) > 0


def test_loader_shard_padding_equal_batches(tiny_model):
    """Unequal per-process batch counts deadlock SPMD collectives; the loader
    must pad to equal counts (DistributedSampler semantics)."""
    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180212", "24h", 24)
    assert len(ds) % 3 != 0  # non-divisible case
    counts = []
    seen = []
    for shard in range(3):
        loader = BatchLoader(ds, batch_size=1, shuffle=True, seed=7,
                             num_shards=3, shard=shard, prefetch=0)
        n = 0
        for batch, periods in loader:
            n += 1
            seen.append(periods[0][0])
        counts.append(n)
    assert len(set(counts)) == 1, counts
    # padding wraps: every sample appears at least once
    assert len(set(seen)) == len(ds)


def test_prefetch_early_exit_does_not_hang(tiny_model):
    import threading

    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180301", "24h", 24)
    loader = BatchLoader(ds, batch_size=1, prefetch=2)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-iteration
    import time

    time.sleep(0.5)
    assert threading.active_count() <= before + 1

def test_prefetch_slow_consumer_terminates(tiny_model):
    """Regression: the producer's end-of-iteration sentinel must not be
    dropped when the queue is full (fast producer, slow consumer). A
    dropped sentinel strands the consumer's blocking get() forever."""
    import threading
    import time

    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180110", "24h", 24)
    loader = BatchLoader(ds, batch_size=1, prefetch=1)
    periods = []
    done = threading.Event()

    def consume():
        for _, p in loader:
            time.sleep(0.05)  # let the producer fill the queue and finish
            periods.append(p[0][0])
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=30), "prefetch loader hung after the last batch"
    assert len(periods) == len(loader)


def test_accumulation_requires_drop_last(tiny_model):
    """accumulation > 1 with drop_last=False would crash reshaping the
    final partial chunk — rejected at construction."""
    ds = Era5Dataset(SyntheticStore(tiny_model), "20180101", "20180120",
                     "24h", 24)
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(ds, batch_size=1, accumulation=2, drop_last=False)


def test_stats_reservoir_bounded():
    """Wind distribution sampling must hold constant memory (reservoir),
    not grow per frame."""
    from pangu_tpu.data.stats import ComprehensiveStats

    class Small(ComprehensiveStats):
        RESERVOIR_SIZE = 64

    st = Small(upper_vars=1, levels=1, surface_vars=4, lat=8, lon=16)
    rng = np.random.default_rng(0)
    for _ in range(10):  # 10 frames x 128 points >> 64-slot reservoir
        st.update(rng.standard_normal((1, 1, 8, 16)).astype(np.float32),
                  rng.standard_normal((4, 8, 16)).astype(np.float32))
    assert st.wind_reservoir.size == 64 and st.wind_filled == 64
    assert st.wind_seen == 10 * 8 * 16
    r = st.results()
    assert np.isfinite(r["wind_percentiles"][50])
    assert r["wind_max"] >= r["wind_percentiles"][99]


def test_native_loader_rejects_short_file(tmp_path, tiny_model):
    """A truncated/smaller .npy must fail loudly on BOTH the native and the
    numpy paths — never leave uninitialized garbage in the batch slot."""
    from pangu_tpu.data import native_loader

    good = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    short = np.arange(12, dtype=np.float32).reshape(2, 3, 2)
    pg, ps = tmp_path / "good.npy", tmp_path / "short.npy"
    np.save(pg, good)
    np.save(ps, short)
    out = np.empty((2, 2, 3, 4), np.float32)
    with pytest.raises((IOError, ValueError)):
        native_loader.read_batch([str(pg), str(ps)], out)


def test_netcdf_expver_resolution():
    """_sel_time picks the expver slice with finite data (the reference
    hardcodes expver=5, silently returning NaN for finalized months)."""
    from pangu_tpu.data.dataset import NetCDFStore

    class FakeVar:
        def __init__(self, values):
            self.values = np.asarray(values)

    class FakeDs:
        def __init__(self, by_expver):
            self._by = by_expver  # {expver: field}
            self.dims = ("time", "expver")
            self.coords = ("time", "expver")

        def __contains__(self, k):
            return k == "expver"

        def __getitem__(self, k):
            assert k == "expver"
            return FakeVar(sorted(self._by))

        def sel(self, time=None, expver=None):
            class Sub:
                def __init__(s, field):
                    s.data_vars = {"msl": FakeVar(field)}
            return Sub(self._by[expver])

    finite = np.ones((4, 4))
    nans = np.full((4, 4), np.nan)
    # finalized month: data in expver=1, NaN in 5 -> must pick 1
    sub = NetCDFStore._sel_time(FakeDs({1: finite, 5: nans}), None)
    assert np.isfinite(sub.data_vars["msl"].values).all()
    # preliminary month: data in expver=5 -> must pick 5
    sub = NetCDFStore._sel_time(FakeDs({1: nans, 5: finite}), None)
    assert np.isfinite(sub.data_vars["msl"].values).all()


def test_netcdf_lru_handle_cache():
    """NetCDFStore opens each .nc file once per cache residency: a month of
    hourly loads hits the monthly surface file's cached handle instead of
    reopening it per sample (round-4 verdict #8; the reference reopens both
    files every load, utils_data.py:146-149). Eviction closes the stalest
    handle; a re-touch refreshes recency."""
    from datetime import datetime

    from pangu_tpu.data.dataset import NetCDFStore

    opens, closes = [], []

    class FakeVar:
        def __init__(self, values):
            self.values = np.asarray(values)

    class FakeDs:
        def __init__(self, path):
            self.path = path
            self.dims, self.coords = ("time",), ("time",)

        def __contains__(self, k):
            return False

        def sel(self, time=None):
            f = np.ones((2, 3, 4), np.float32)
            vars_ = {v: FakeVar(f) for v in ("z", "q", "t", "u", "v",
                                             "msl", "u10", "v10", "t2m")}

            class Sub:
                data_vars = vars_

                def __getitem__(s, k):
                    return vars_[k]
            return Sub()

        def close(self):
            closes.append(self.path)

    store = NetCDFStore.__new__(NetCDFStore)  # skip the xarray gate
    store._init_state("/era5", cache_size=2)
    store._open_dataset = lambda path: (opens.append(path), FakeDs(path))[1]

    # 3 hourly loads in one month/day: 2 files opened ONCE, not 6 times
    for h in range(3):
        u, s = store.load(datetime(2023, 1, 5, h))
        assert u.shape == (5, 2, 3, 4) and s.shape == (4, 2, 3, 4)
    assert len(opens) == 2 and not closes

    # next day: new upper file evicts the stalest handle (the old upper —
    # the surface handle was re-touched more recently)
    store.load(datetime(2023, 1, 6, 0))
    assert len(opens) == 3
    assert closes == ["/era5/upper/upper_20230105.nc"]

    # back to day 5: its upper handle was evicted -> reopened (and the
    # day-6 handle, now stalest, is evicted + closed in turn)
    store.load(datetime(2023, 1, 5, 3))
    assert len(opens) == 4
    assert closes[1] == "/era5/upper/upper_20230106.nc"

    store.close()  # the 2 resident handles
    assert len(closes) == 4 and not store._cache


def test_eval_loader_keeps_tail_batch():
    """val/test loaders must score EVERY sample: with batch_size=2 over an
    odd-length range the tail sample rides a final partial batch instead of
    being silently dropped (train keeps drop_last for static jit shapes)."""
    import dataclasses

    from pangu_tpu.config import pangu_tiny
    from pangu_tpu.data.dataset import make_loader

    cfg = pangu_tiny()
    data = dataclasses.replace(
        cfg.data, store="synthetic",
        test_start="20180101 00:00:00", test_end="20180107 00:00:00",
        test_freq="24h",
        train_start="20180101 00:00:00", train_end="20180107 00:00:00",
        train_freq="24h",
    )
    test_loader = make_loader(data, cfg.model, "test", 24, batch_size=2)
    n = sum(b.upper.shape[0] for b, _ in test_loader)
    assert n == len(test_loader.ds)  # odd count: 5 samples -> 2+2+1
    assert n % 2 == 1, "range chosen to produce a partial tail batch"
    train_loader = make_loader(data, cfg.model, "train", 24, batch_size=2)
    n_train = sum(b.upper.shape[0] for b, _ in train_loader)
    assert n_train == len(train_loader.ds) - (len(train_loader.ds) % 2)
