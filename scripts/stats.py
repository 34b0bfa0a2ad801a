#!/usr/bin/env python
"""Dataset statistics tool (reference stat.py role)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.cli import base_parser, build_config
from pangu_tpu.data.dataset import Era5Dataset, make_store
from pangu_tpu.data.stats import analyze_dataset


def main() -> None:
    p = base_parser("Compute dataset statistics")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--tag", default=None)
    args = p.parse_args()

    cfg = build_config(args)
    store = make_store(cfg.data, cfg.model)
    ranges = {
        "train": (cfg.data.train_start, cfg.data.train_end, cfg.data.train_freq),
        "val": (cfg.data.val_start, cfg.data.val_end, cfg.data.val_freq),
        "test": (cfg.data.test_start, cfg.data.test_end, cfg.data.test_freq),
    }
    start, end, freq = ranges[args.split]
    ds = Era5Dataset(store, start, end, freq, cfg.horizon)
    tag = args.tag or f"{args.split}_{start[:4]}"
    out = analyze_dataset(ds, cfg.out_dir, tag, limit=args.limit)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
