"""pangu_tpu.utils.compile_cache — persistent-cache helpers.

The stabilized key must (a) reduce to a pure device_kind hash for
single-device programs — that is what makes a cache primed on one chip
instance hit on another instance of the same kind — and (b) leave
multi-device hashing exactly as jax ships it, because mesh topology
legitimately affects multi-chip compilation.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np
import pytest

from pangu_tpu.utils import compile_cache


def _hexdigest(fn, *args):
    h = hashlib.sha256()
    fn(h, *args)
    return h.hexdigest()


def test_single_device_key_is_kind_only():
    from jax._src import cache_key as ck

    compile_cache.stabilize_single_chip_cache_key()
    dev = jax.devices()[0]
    kind_only = hashlib.sha256()
    ck._hash_string(kind_only, dev.device_kind)
    got = _hexdigest(ck._hash_accelerator_config, np.array([dev]))
    assert got == kind_only.hexdigest()


def test_multi_device_key_delegates_to_jax():
    from jax._src import cache_key as ck
    from jax._src.lib import xla_client

    compile_cache.stabilize_single_chip_cache_key()
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices (PANGU_TPU_TESTS runs on one chip)")
    multi = np.array(devs[:2])

    # replicate jax's unpatched logic: serialized topology, falling back to
    # per-device kinds (jax._src.cache_key._hash_accelerator_config)
    expected = hashlib.sha256()
    try:
        expected.update(
            xla_client.get_topology_for_devices(list(multi.flat)).serialize())
    except Exception:  # noqa: BLE001 — backend may not support serialization
        pytest.skip("backend cannot serialize topology; delegation branch "
                    "indistinguishable from the fallback here")
    assert _hexdigest(ck._hash_accelerator_config, multi) == expected.hexdigest()


def test_compile_options_assignment_stripped_only_for_single():
    from jax._src import cache_key as ck
    from jax._src.lib import xla_client

    compile_cache.stabilize_single_chip_cache_key()
    opts = xla_client.CompileOptions()
    assert opts.num_replicas * opts.num_partitions == 1
    base = _hexdigest(ck._hash_serialized_compile_options, opts)

    # with a 2-device assignment on a replicated program, the assignment
    # must still be part of the key (no stripping)
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices (PANGU_TPU_TESTS runs on one chip)")

    def opts_with(order):
        o = xla_client.CompileOptions()
        o.num_replicas = 2
        o.device_assignment = xla_client.DeviceAssignment.create(
            np.array([[devs[i].id] for i in order]))
        return o

    with_assignment = _hexdigest(
        ck._hash_serialized_compile_options, opts_with((0, 1)))
    swapped = _hexdigest(
        ck._hash_serialized_compile_options, opts_with((1, 0)))
    assert with_assignment != swapped  # assignment still distinguishes keys
    assert base not in (with_assignment, swapped)


def test_cold_abort_compile_probe(tmp_path):
    """cold_abort_compile: a persistent-cache MISS raises ColdCompileAbort
    (with the missed key) BEFORE XLA compilation starts; a HIT proceeds
    normally (deserialize + load) and the executable runs. This is the
    primitive behind bench.py's adaptive phase order (round-4 post-mortem:
    a >240 s blocked cold compile silently forfeited the whole artifact)."""
    import jax.numpy as jnp

    from jax.experimental.compilation_cache import compilation_cache as cc

    from pangu_tpu.utils.compile_cache import (
        ColdCompileAbort,
        cold_abort_compile,
    )

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cc.set_cache_dir(str(tmp_path / "cc"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        def f(x):
            return jnp.sin(x) @ x + 1.0

        x = jnp.ones((16, 16), jnp.float32)
        with pytest.raises(ColdCompileAbort) as ei:
            with cold_abort_compile():
                jax.jit(f).lower(x).compile()
        assert ei.value.cache_key  # the missed key is reported

        jax.jit(f).lower(x).compile()  # real compile populates the cache

        # drop the in-memory executable cache: identical modules otherwise
        # short-circuit before the persistent cache is consulted (a fresh
        # bench process starts this way)
        jax.clear_caches()
        with cold_abort_compile():  # HIT: must NOT raise
            compiled = jax.jit(f).lower(x).compile()
        np.testing.assert_allclose(np.asarray(compiled(x)),
                                   np.asarray(f(x)), rtol=1e-6)
    finally:
        cc.set_cache_dir(old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_log_cache_events_forwards_hit_and_miss(tmp_path):
    """log_cache_events forwards jax's persistent-cache hit/miss lines to
    the given sink — the self-diagnosis channel BENCH_r05 artifacts carry
    (round-4 verdict #1a)."""
    import jax.numpy as jnp

    from jax.experimental.compilation_cache import compilation_cache as cc

    from pangu_tpu.utils.compile_cache import log_cache_events

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cc.set_cache_dir(str(tmp_path / "cc"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    seen = []
    log_cache_events(seen.append)
    try:
        def g(x):
            return jnp.cos(x) @ x - 2.0

        x = jnp.ones((8, 8), jnp.float32)
        jax.jit(g).lower(x).compile()  # miss + write
        assert any("cache miss" in m.lower() for m in seen), seen
        jax.clear_caches()  # else the in-memory executable short-circuits
        jax.jit(g).lower(x).compile()  # hit
        assert any("cache hit" in m.lower() for m in seen), seen
    finally:
        cc.set_cache_dir(old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_enable_compile_cache_sets_directory(tmp_path, monkeypatch):
    target = tmp_path / "cache"
    got = compile_cache.enable_compile_cache(str(target))
    assert got == str(target)
    assert jax.config.jax_compilation_cache_dir == str(target)

    monkeypatch.setenv("PANGU_COMPILE_CACHE", str(tmp_path / "env_cache"))
    got_env = compile_cache.enable_compile_cache()
    assert got_env == str(tmp_path / "env_cache")
