#!/bin/sh
# Build the native host-side library (see native/gpquad_native.cc).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fopenmp -shared -fPIC \
    native/gpquad_native.cc -o native/libgpquad_native.so
echo "built native/libgpquad_native.so"
