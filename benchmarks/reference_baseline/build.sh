#!/bin/bash
# Build the reference CPU VO library + our benchmark driver.
# Reference sources stay read-only in /root/reference; only the plain CPU
# path is compiled (no OpenCL / SFML / png++).
set -e
cd "$(dirname "$0")"
REF=/root/reference/viso
# -include shims: reference relies on transitive includes that newer
# libstdc++ no longer provides
g++ -std=c++11 -O3 -march=native -DUSE_SIMD -include cstdint -include random \
    -I"$REF" \
    ref_bench.cpp \
    "$REF/filter.cpp" "$REF/matcher.cpp" "$REF/matrix.cpp" \
    "$REF/triangle.cpp" "$REF/viso.cpp" "$REF/viso_mono.cpp" \
    "$REF/viso_stereo.cpp" "$REF/reconstruction.cpp" \
    -o ref_bench -w
echo "built ref_bench"
