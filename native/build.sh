#!/bin/sh
# Build the native preprocessing library (see emsanet_native.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -fPIC -shared \
    -o libemsanet_native.so emsanet_native.cpp
echo "built $(pwd)/libemsanet_native.so"
