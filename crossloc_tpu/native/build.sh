#!/bin/bash
# Build the native host-IO library (decode + resize) as a plain shared
# object with a C ABI (ctypes-loaded; no pybind11 dependency).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libclloader.so loader.cpp -lpng -ljpeg -lz
echo "built $(pwd)/libclloader.so"
