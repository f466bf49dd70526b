#!/bin/sh
# Build the native host-side kernels (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o liblevenshtein.so levenshtein.cpp
echo "built $(pwd)/liblevenshtein.so"
