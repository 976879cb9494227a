#!/bin/bash
# Build the golden generator against a local CPU-only build of the
# reference renderer.  One-time setup (already done if build/ref exists):
#   cp -r /root/reference build/ref
#   # stub the stripped precomputed blobs (3d-noise/cirrus/oidn weights)
#   cmake -B build/ref/build -S build/ref -G Ninja -DCMAKE_BUILD_TYPE=Release \
#         -DENABLE_VK_IMPL=OFF -DENABLE_DX_IMPL=OFF
#   ninja -C build/ref/build Ray
set -e
cd "$(dirname "$0")/../.."
python tools/golden/gen_table.py build/golden_table.inc
g++ -O2 -std=c++17 -msse2 -Ibuild -Ibuild/ref \
    tools/golden/golden_gen.cpp build/ref/tests/utils.cpp \
    build/ref/build/libRay.a -lpthread -o build/golden_gen
echo built build/golden_gen
