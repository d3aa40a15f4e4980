#!/bin/sh
# Build the native data-path library. Output lands next to the sources and
# is discovered by gaussianprediction_tpu/data/native.py at import time.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libfastpng.so fastpng.cpp -lz -lpthread
echo "built $(pwd)/libfastpng.so"
