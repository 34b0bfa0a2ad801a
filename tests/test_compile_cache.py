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


def test_enable_compile_cache_sets_directory(tmp_path, monkeypatch):
    target = tmp_path / "cache"
    got = compile_cache.enable_compile_cache(str(target))
    assert got == str(target)
    assert jax.config.jax_compilation_cache_dir == str(target)

    monkeypatch.setenv("PANGU_COMPILE_CACHE", str(tmp_path / "env_cache"))
    got_env = compile_cache.enable_compile_cache()
    assert got_env == str(tmp_path / "env_cache")
