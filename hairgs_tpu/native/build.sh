#!/bin/sh
# Build the native host-side accelerators.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libhairgs_native.so strand_walk.cc merge_candidates.cc
echo "built $(pwd)/libhairgs_native.so"
