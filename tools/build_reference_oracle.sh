#!/usr/bin/env bash
# Build the reference sprintz C++ as a byte-exactness oracle library.
# Requires: x86-64 with AVX2+BMI2, g++. The library is consumed by
# tests/oracle.py (env SPRINTZ_REF_LIB overrides the default path).
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}

mkdir -p "$OUT"
cd "$OUT"
units=(format sprintz sprintz_delta sprintz_delta_rle sprintz_delta_lowdim
       sprintz_xff sprintz_xff_rle sprintz_xff_lowdim delta predict online
       univariate_8b sprintz_delta_rle_query sprintz_xff_rle_query)
for f in "${units[@]}"; do
  g++ -std=c++14 -O2 -march=haswell -fPIC -c "$REF/cpp/Compress/$f.cpp" -o "$f.o"
done
g++ -shared -o libsprintz_ref.so ./*.o
echo "oracle: $OUT/libsprintz_ref.so"
