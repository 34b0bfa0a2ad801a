"""Persistent XLA compilation-cache helpers.

Full-geometry programs take minutes to compile (and longer through a
remote-device tunnel); a persistent on-disk cache makes restarts — resumed
finetunes, repeated rollouts, benchmark reruns — pay that cost once. The
reference has no equivalent (PyTorch eager recompiles nothing); under XLA
this is the difference between a seconds and a minutes startup.

Two pieces:

* :func:`enable_compile_cache` — point jax's persistent cache at a
  directory (argument, ``PANGU_COMPILE_CACHE`` env var, or a default next
  to the repo root) and lower the min-compile-time threshold so real
  programs are kept.
* :func:`stabilize_single_chip_cache_key` — make cache keys survive
  "chip roulette". jax's default key hashes the serialized PjRt topology
  of the attached devices and the compile options including the device
  assignment (assignment stripping is gated to ``platform == "gpu"``).
  When a scheduler/tunnel attaches each process to a different chip
  *instance* of the same kind, instance-specific topology bytes change the
  key and a cache primed in one run misses in the next, recompiling for
  minutes with byte-identical code (observed; see docs/PERFORMANCE.md
  "Measurement methodology"). For a SINGLE-chip process the compilation is
  fully determined by ``device_kind``, so hash that instead. Multi-device
  programs keep jax's default hashing untouched — mesh topology (ICI
  wiring, slice shape) legitimately affects compilation there.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_stabilized = False


def enable_compile_cache(cache_dir: str | None = None,
                         stabilize: bool = True) -> str:
    """Enable jax's persistent compilation cache; returns the directory.

    Order of precedence for the directory: explicit argument, the
    ``PANGU_COMPILE_CACHE`` environment variable, then ``.jax_cache`` at
    the repo root. ``stabilize`` additionally applies
    :func:`stabilize_single_chip_cache_key`.
    """
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc

    path = cache_dir or os.environ.get("PANGU_COMPILE_CACHE") or _DEFAULT_CACHE_DIR
    cc.set_cache_dir(path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if stabilize:
        stabilize_single_chip_cache_key()
    return path


def stabilize_single_chip_cache_key() -> None:
    """Patch jax's cache key (process-locally) to be chip-instance-stable
    for single-device programs; multi-device keys are left untouched.

    Idempotent; safe to call before or after backend initialization (the
    key functions are looked up at hash time).
    """
    global _stabilized
    if _stabilized:
        return
    from jax._src import cache_key as ck

    orig_accel = ck._hash_accelerator_config
    orig_opts = ck._hash_serialized_compile_options

    def _hash_accelerator_config(hash_obj, accelerators):
        devices = list(accelerators.flat)
        if len(devices) != 1:
            return orig_accel(hash_obj, accelerators)
        ck._hash_string(hash_obj, devices[0].device_kind)

    def _hash_compile_options(hash_obj, opts, strip_device_assignment=False):
        strip = strip_device_assignment or opts.num_replicas * opts.num_partitions == 1
        return orig_opts(hash_obj, opts, strip_device_assignment=strip)

    ck._hash_accelerator_config = _hash_accelerator_config
    ck._hash_serialized_compile_options = _hash_compile_options
    _stabilized = True
