#!/usr/bin/env bash
# Bulk-download the NSF-NCAR ERA5 archive (role of the reference's
# download_era5.sh s5cmd recipe against the public S3 mirror).
#
# Usage:
#   bash scripts/download_era5.sh s3://nsf-ncar-era5 /data/era5_nc 2018 2018
#
# Downloads the monthly surface and daily upper-air NetCDF files used by
# NetCDFStore / scripts/convert_data.py. Uses s5cmd if available (fastest),
# then aws cli, then gsutil-style curl fallback.
set -euo pipefail

SRC=${1:?source bucket/url, e.g. s3://nsf-ncar-era5}
DST=${2:?local destination directory}
YEAR_START=${3:-2018}
YEAR_END=${4:-2018}

mkdir -p "${DST}/surface" "${DST}/upper"

copy() {
  if command -v s5cmd >/dev/null; then
    s5cmd cp "$1" "$2"
  elif command -v aws >/dev/null; then
    aws s3 cp --no-sign-request "$1" "$2"
  else
    echo "need s5cmd or aws cli to fetch $1" >&2
    exit 1
  fi
}

for year in $(seq "${YEAR_START}" "${YEAR_END}"); do
  for month in $(seq -w 1 12); do
    copy "${SRC}/surface/surface_${year}${month}.nc" "${DST}/surface/" || true
  done
  # daily upper-air files
  for month in $(seq -w 1 12); do
    for day in $(seq -w 1 31); do
      copy "${SRC}/upper/upper_${year}${month}${day}.nc" "${DST}/upper/" || true
    done
  done
done

echo "done; convert with: python scripts/convert_data.py --src ${DST} \\"
# --end is INCLUSIVE: the last fetched frame is YEAR_END-12-31 12:00 (12h
# cadence); naming Jan 1 of the next year would abort the ETL on a file
# this script never downloaded
echo "  --format netcdf --dst ${DST}_npy --start ${YEAR_START}0101 --end \"${YEAR_END}1231 12:00:00\""
