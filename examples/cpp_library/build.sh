#!/bin/bash
# Build the native runtime library (same flags as the ctypes loader,
# native/__init__.py) and this example against it.
set -e
cd "$(dirname "$0")"
REPO=../..
NATIVE=$REPO/eddie_wang_hackathon2023_tpu/native
g++ -O2 -fPIC -shared -o libewtruntime.so $NATIVE/batch_runtime.cc
g++ -O2 -o cpp_library_example main.cpp -ldl
echo "built: ./cpp_library_example ./libewtruntime.so"
