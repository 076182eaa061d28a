#!/bin/sh
# Build the native TIFF codec next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libtiffcodec.so tiffcodec.cpp
echo "built $(pwd)/libtiffcodec.so"
