#!/bin/bash
# Build the native retrieval backend (ctypes shared library).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 dpretrieval.cpp -o libdpretrieval.so \
    -I/usr/include/opencv4 \
    -lopencv_core -lopencv_features2d
echo "built $(pwd)/libdpretrieval.so"
