#!/usr/bin/env python
"""Dataset ETL (reference convert_era5.py / download_era5.sh role):
convert NetCDF archives or reference per-hour .pt stores to the framework's
per-hour .npy store.

  python scripts/convert_data.py --src /data/nc --format netcdf \\
      --dst /data/npy --start 20180101 --end 20190101 --freq 1h
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.data.convert import convert_netcdf_to_npy, convert_pt_to_npy


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--format", choices=["netcdf", "pt"], default="netcdf")
    p.add_argument("--start", required=True)
    p.add_argument("--end", required=True)
    p.add_argument("--freq", default="1h")
    p.add_argument("--workers", type=int, default=16)
    args = p.parse_args()

    fn = convert_netcdf_to_npy if args.format == "netcdf" else convert_pt_to_npy
    n = fn(args.src, args.dst, args.start, args.end, args.freq, args.workers)
    print(f"converted {n} timestamps into {args.dst}")


if __name__ == "__main__":
    main()
