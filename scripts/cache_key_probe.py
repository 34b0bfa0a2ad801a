"""Dump jax persistent-cache key components for a tiny program.

Appends one JSON line per compilation: the per-entry hashes jax folds into
the cache key (computation, backend version, XLA flags, compile options,
accelerator config) plus the serialized compile-options proto. Diffing two
lines from different runs identifies exactly which component made a primed
cache miss — used to diagnose the chip-roulette instability that
`pangu_tpu.utils.compile_cache.stabilize_single_chip_cache_key` fixes
(docs/PERFORMANCE.md "Measurement methodology").

Usage: python scripts/cache_key_probe.py [out.jsonl]   (default: stdout)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.utils.compile_cache import stabilize_single_chip_cache_key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else None
    stabilize_single_chip_cache_key()
    from jax._src import cache_key as ck

    records = []
    orig_get = ck.get

    def instrumented_get(module, devices, compile_options, backend,
                         *args, **kwargs):
        entry = {}
        for name, fn in (
            ("computation", lambda h: ck._hash_computation(
                h, module, ck.IgnoreCallbacks.NO)),
            ("backend", lambda h: ck._hash_platform(h, backend)),
            ("xla_flags", lambda h: ck._hash_xla_flags(
                h, ck.get_flag_prefixes())),
            ("compile_options", lambda h: ck._hash_serialized_compile_options(
                h, compile_options)),
            ("accelerator", lambda h: ck._hash_accelerator_config(
                h, devices)),
        ):
            h = hashlib.sha256()
            fn(h)
            entry[name] = h.hexdigest()
        entry["opts_proto_hex"] = compile_options.SerializeAsString().hex()
        records.append(entry)
        return orig_get(module, devices, compile_options, backend,
                        *args, **kwargs)

    ck.get = instrumented_get

    import jax
    import jax.numpy as jnp
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.set_cache_dir("/tmp/cache_key_probe")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    f(jnp.ones((256, 256)))
    payload = {
        "device_kind": jax.devices()[0].device_kind,
        "n_compilations": len(records),
        "keys": records[-1] if records else None,
    }
    line = json.dumps(payload)
    if out:
        with open(out, "a") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
