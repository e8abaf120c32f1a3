#!/bin/bash
# Build the reference CPU VO library + our benchmark driver.
# Reference sources stay read-only in /root/reference; only the plain CPU
# path is compiled (no OpenCL / SFML / png++).
set -e
cd "$(dirname "$0")"
REF=/root/reference/viso
# -include shims: reference relies on transitive includes that newer
# libstdc++ no longer provides
SRCS="$REF/filter.cpp $REF/matcher.cpp $REF/matrix.cpp \
      $REF/triangle.cpp $REF/viso.cpp $REF/viso_mono.cpp \
      $REF/viso_stereo.cpp $REF/reconstruction.cpp"
FLAGS="-std=c++11 -O3 -march=native -DUSE_SIMD -include cstdint -include random -I$REF -w"
g++ $FLAGS ref_bench.cpp $SRCS -o ref_bench
echo "built ref_bench"
g++ $FLAGS ref_dump.cpp $SRCS -o ref_dump
echo "built ref_dump"
