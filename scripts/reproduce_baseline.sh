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
set -euo pipefail

WORK=${1:?working directory (needs ~700 GB for one year of ERA5)}
cd "$(dirname "$0")/.."
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
    --format netcdf --start "20180101 00:00:00" --end "20190101 00:00:00" \
    --freq 12h

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
