#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/geojson_vt_cpp_spark.zip
mkdir -p dist
zip -qr dist/geojson_vt_cpp_spark.zip geojson_vt_cpp_spark -x '*__pycache__*'
echo "dist/geojson_vt_cpp_spark.zip"
echo "usage: spark-submit --py-files dist/geojson_vt_cpp_spark.zip your_job.py"
