#!/bin/sh
# Build the native C++ components into osufusion_tpu/native/.
# Plain g++ invocation (cmake works too: cmake -B build && cmake --build build).
set -e
cd "$(dirname "$0")"
mkdir -p ../osufusion_tpu/native
g++ -O3 -fPIC -shared -std=c++17 -march=native \
    difficulty.cpp bezier.cpp \
    -o ../osufusion_tpu/native/libosufusion_native.so
echo "built osufusion_tpu/native/libosufusion_native.so"
