#!/bin/sh
# Build the native host-side kernels into csrc/build/.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -march=native -std=c++17 -shared -fPIC st_oracle.cpp -o build/libst_oracle.so
echo "built csrc/build/libst_oracle.so"
