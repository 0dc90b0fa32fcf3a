#!/bin/sh
# Build the batched-stepper shared library against the pip wheel's libmujoco.
set -e
cd "$(dirname "$0")"
MJ_DIR=$(python -c "import mujoco, os; print(os.path.dirname(mujoco.__file__))")
MJ_LIB=$(ls "$MJ_DIR"/libmujoco.so.* | head -1)
g++ -O2 -fPIC -shared -o "${OUT:-libmjbatch.so}" mjbatch.cpp \
    -I"$MJ_DIR/include" \
    "$MJ_LIB" -Wl,-rpath,"$MJ_DIR"
echo "built ${OUT:-$(pwd)/libmjbatch.so} against $MJ_LIB"
