#!/usr/bin/env bash
# Reproduce the reference's published accuracy tables end to end
# (BASELINE.md; reference README.md:20-26, fig/tab1.png, fig/tab2.png):
# official pretrained ONNX weights -> pangu_tpu params -> 24 h scores on
# 2018 ERA5 at 00:00/12:00 UTC. Acceptance: ONNX-weight Z500 RMSE 45.001,
# T850 0.717 within 1%.
#
# Requires network egress (weight + ERA5 downloads); every step below it
# is covered by the test suite against synthetic stand-ins, the live torch
# reference modules, and the real keys_all.csv structure
# (tests/test_onnx_import.py, tests/test_parity_reference.py,
# tests/test_full_model_parity.py).
#
# Usage: bash scripts/reproduce_baseline.sh /data/workdir
#        bash scripts/reproduce_baseline.sh --dry-run [workdir]
#
# --dry-run validates every stage's WIRING without network or real data
# (exercised by tests/test_scripts_cli.py so the day egress appears the
# real run is one command): the weight download is replaced by a synthetic
# official-structure ONNX (tests/test_onnx_import.py::build_synthetic_onnx
# over the zero-dependency onnx_wire encoder), the ERA5 download by a
# generated reference-layout .pt store; conversion, ETL, scoring and the
# verdict parse all run for real at tiny geometry.
set -euo pipefail

cd "$(dirname "$0")/.."

if [ "${1:-}" = "--dry-run" ]; then
  WORK=${2:-$(mktemp -d)}
  mkdir -p "$WORK"
  export PYTHONPATH=".:${PYTHONPATH:-}"
  export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}

  # 1'. synthetic pretrained weights (stands in for the curl)
  python - "$WORK" <<'EOF'
import sys

import numpy as np

from tests.test_onnx_import import build_synthetic_onnx
from pangu_tpu.config import pangu_tiny

build_synthetic_onnx(pangu_tiny().model, np.random.default_rng(3),
                     sys.argv[1] + "/pangu_weather_24.onnx")
print("synthetic ONNX written")
EOF

  # 2. ONNX -> params npz + aux arrays (REAL stage, tiny geometry)
  python scripts/convert_weights.py --onnx "$WORK/pangu_weather_24.onnx" \
    --preset tiny --horizon 24 --out "$WORK/params_24.npz" \
    --aux-out "$WORK/aux_data"

  # 3'. synthetic reference-layout .pt store (stands in for the ERA5
  #     download), then the REAL ETL stage into the .npy store
  python - "$WORK" <<'EOF'
import os
import sys

import numpy as np
import pandas as pd
import torch

from pangu_tpu.config import pangu_tiny
from pangu_tpu.data.dataset import time_str

m = pangu_tiny().model
root = sys.argv[1] + "/era5_pt"
os.makedirs(root + "/upper", exist_ok=True)
os.makedirs(root + "/surface", exist_ok=True)
rng = np.random.default_rng(0)
for t in pd.date_range("20180101 00:00:00", "20180103 12:00:00", freq="12h"):
    s = time_str(t.to_pydatetime())
    torch.save(torch.from_numpy(rng.standard_normal(
        (m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)),
        f"{root}/upper/upper_{s}.pt")
    torch.save(torch.from_numpy(rng.standard_normal(
        (m.surface_vars, m.lat, m.lon)).astype(np.float32)),
        f"{root}/surface/surface_{s}.pt")
print("synthetic .pt store written")
EOF
  python scripts/convert_data.py --src "$WORK/era5_pt" --dst "$WORK/era5_npy" \
    --format pt --start "20180101 00:00:00" --end "20180103 12:00:00" \
    --freq 12h --workers 2

  # 4. score (REAL stage: the reference test() protocol, tiny geometry)
  python scripts/test.py --preset tiny --weights "$WORK/params_24.npz" \
    --aux-dir "$WORK/aux_data" \
    --set data.store=npy --set data.root="$WORK/era5_npy" \
    --set data.test_start="20180101 00:00:00" \
    --set data.test_end="20180103 00:00:00" \
    --set data.test_freq=12h \
    --out "$WORK/scores"

  # 5'. verdict parse runs for real; acceptance numbers are only checked
  #     for finiteness (synthetic weights score garbage, by construction)
  python - "$WORK/scores/test/24/csv" <<'EOF'
import sys

import numpy as np

from pangu_tpu.eval.csv_io import load_error_scores

csv = sys.argv[1]
# tiny geometry has its own level set — parse the same tables the real
# verdict reads, keyed by whatever levels exist
zdf = load_error_scores(csv, "rmse", "upper_z")
tdf = load_error_scores(csv, "rmse", "upper_t")
z = zdf[zdf.columns[len(zdf.columns) // 2]].mean()
t = tdf[tdf.columns[len(tdf.columns) // 2]].mean()
assert np.isfinite(z) and np.isfinite(t), (z, t)
print(f"dry-run OK: scoring pipeline wired (mid-level Z rmse={z:.3f}, "
      f"T rmse={t:.3f} on synthetic weights/data)")
EOF
  exit 0
fi

WORK=${1:?working directory (needs ~700 GB for one year of ERA5)}
mkdir -p "$WORK"

# 1. Official pretrained weights (reference README "Pretrained models").
for h in 24 6 3 1; do
  [ -f "$WORK/pangu_weather_${h}.onnx" ] || \
    curl -L -o "$WORK/pangu_weather_${h}.onnx" \
      "https://get.ecmwf.int/repository/test-data/ai-models/pangu-weather/pangu_weather_${h}.onnx"
done

# 2. ONNX -> params npz + normalization/mask aux arrays. The torch<->onnx
#    name map is derived from the graph structure (keys_all.csv optional).
for h in 24 6 3 1; do
  [ -f "$WORK/params_${h}.npz" ] || \
    python scripts/convert_weights.py --onnx "$WORK/pangu_weather_${h}.onnx" \
      --horizon "$h" --out "$WORK/params_${h}.npz" --aux-out "$WORK/aux_data"
done

# 3. 2018 ERA5 (surface monthly + upper daily NetCDF from the NSF-NCAR
#    mirror), then ETL into the .npy store layout.
[ -d "$WORK/era5_nc/surface" ] || \
  bash scripts/download_era5.sh s3://nsf-ncar-era5 "$WORK/era5_nc" 2018 2018
[ -d "$WORK/era5_npy" ] || \
  python scripts/convert_data.py --src "$WORK/era5_nc" --dst "$WORK/era5_npy" \
    --format netcdf --start "20180101 00:00:00" --end "20181231 12:00:00" \
    --freq 12h
    # --end is INCLUSIVE (pd.date_range); 20190101 00:00 would demand
    # 2019 files the step-3 download never fetched and abort the ETL at
    # its very last frame. The scoring dataset below may still use a
    # 20190101 test_end: the reference length rule drops trailing inits,
    # so no 2019 frame is ever loaded.

# 4. Score the 24 h model on 2018 at 00:00/12:00 UTC (the reference's
#    test() protocol; writes rmse_*/acc_* CSVs).
python scripts/test.py --weights "$WORK/params_24.npz" \
  --aux-dir "$WORK/aux_data" \
  --set data.store=npy --set data.root="$WORK/era5_npy" \
  --set data.test_start="20180101 00:00:00" \
  --set data.test_end="20190101 00:00:00" \
  --set data.test_freq=12h \
  --out "$WORK/scores"

# 5. Compare to the acceptance numbers.
python - "$WORK/scores/test/24/csv" <<'EOF'
import sys
from pangu_tpu.eval.csv_io import load_error_scores
csv = sys.argv[1]
z = load_error_scores(csv, "rmse", "upper_z")["500"].mean()
t = load_error_scores(csv, "rmse", "upper_t")["850"].mean()
failed = False
for name, got, want in (("Z500", z, 45.001), ("T850", t, 0.717)):
    rel = abs(got - want) / want
    status = "OK" if rel < 0.01 else "FAIL"
    failed = failed or rel >= 0.01
    print(f"{name}: {got:.3f} vs ONNX-weight baseline {want} "
          f"({rel * 100:.2f}% off) {status}")
sys.exit(1 if failed else 0)
EOF
