#!/bin/sh
# Build the native decoder shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o "${OUT:-libvideodec.so}" videodec.cpp \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lswscale -lavutil
echo "built ${OUT:-$(pwd)/libvideodec.so}"
