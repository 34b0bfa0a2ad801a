"""Capture + summarize a device profile of the full-geometry train step.

Runs K jitted train steps under jax.profiler, then parses the trace-viewer
JSON and prints per-op-group device time — the numbers behind the
docs/PERFORMANCE.md component tables. Groups are coarse name prefixes
(pallas kernel names, fusion kinds, copies) because XLA op names are
build-specific.

Usage: python scripts/profile_train.py [--steps 3] [--out /tmp/pangu_prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def capture(out_dir: str, steps: int, save_attn: bool | None = None,
            save_mlp: bool | None = None) -> None:
    import jax

    import bench
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain
    from pangu_tpu.model import PanguModel
    from pangu_tpu.train.step import Batch, make_optimizer, make_train_step
    from pangu_tpu.train.trainer import init_train_state

    bench._enable_compile_cache()
    kw = dict(
        horizon=24, compute_dtype="bfloat16", matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    # None = keep the shipped config default (both save policies are ON by
    # default; --save-attn=0/1 overrides explicitly)
    if save_attn is not None:
        kw["remat_save_attention"] = save_attn
    if save_mlp is not None:
        kw["remat_save_mlp"] = save_mlp
    cfg = pangu_pretrain(**kw)
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (1, m.surface_vars, m.lat, m.lon)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)
    optimizer = make_optimizer(cfg)
    step = jax.jit(make_train_step(model, cfg, optimizer),
                   donate_argnums=(0,))
    state = init_train_state(model, cfg, aux, optimizer, params=params)
    batch = Batch(upper, surface, upper, surface)
    state, loss = step(state, batch, aux, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(loss)
    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        state, loss = step(state, batch, aux, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()


GROUPS = (
    ("pallas attention", ("attn", "fused_block", "attention")),
    # the train megakernel (fused_block_train) runs under the block scope,
    # as did the epilogue kernels it replaced
    ("pallas block", ("block",)),
    ("pallas mlp", ("raw_fwd", "raw_bwd", "mlp")),
    ("fusion", ("fusion",)),
    ("convert/reduce", ("convert", "reduce", "all-reduce")),
    ("copy/slice/pad", ("copy", "slice", "pad", "select", "dynamic")),
    ("dot", ("dot", "conv")),
)


def group_of(name: str) -> str:
    low = name.lower()
    for g, keys in GROUPS:
        if any(k in low for k in keys):
            return g
    return "other"


def summarize(out_dir: str, steps: int) -> None:
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(json.dumps({"error": f"no trace under {out_dir}"}))
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device and tid track
    # "XLA Ops"
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pnames.items()
                   if "TPU" in n or "/device" in n.lower()}
    # leaf op lane only — container lanes (Steps, queues, the jit_step
    # umbrella) double-count everything beneath them
    op_lanes = {k for k, n in tnames.items()
                if k[0] in device_pids and "XLA Ops" in n}
    by_group = collections.Counter()
    by_name = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        dur = e.get("dur", 0)  # us
        by_group[group_of(e.get("name", ""))] += dur
        by_name[e.get("name", "")] += dur
    total = sum(by_group.values())
    print(json.dumps({
        "trace": path,
        "steps": steps,
        "device_ms_per_step": {k: round(v / 1e3 / steps, 1)
                               for k, v in by_group.most_common()},
        "total_device_ms_per_step": round(total / 1e3 / steps, 1),
        "top_ops_ms_per_step": {k[:80]: round(v / 1e3 / steps, 1)
                                for k, v in by_name.most_common(40)},
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/pangu_prof")
    p.add_argument("--save-attn", type=int, choices=(0, 1), default=None,
                   help="force remat_save_attention (default: config default)")
    p.add_argument("--save-mlp", type=int, choices=(0, 1), default=None,
                   help="force remat_save_mlp (default: config default)")
    p.add_argument("--summarize-only", action="store_true")
    args = p.parse_args()
    if not args.summarize_only:
        capture(args.out, args.steps,
                save_attn=None if args.save_attn is None else bool(args.save_attn),
                save_mlp=None if args.save_mlp is None else bool(args.save_mlp))
    summarize(args.out, args.steps)


if __name__ == "__main__":
    main()
