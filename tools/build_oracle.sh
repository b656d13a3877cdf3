#!/bin/bash
# Build the reference PhnRec as a test oracle, OUTSIDE the repo (never shipped).
# Lean PHNREC_ONLY build, no BLAS, NN_FAST_EXP on (matches the shipped binaries:
# makefile_phnrec.lin:10 minus USE_BLAS, which only changes GEMM summation order).
# The bundled getopt.{cpp,h} conflicts with glibc; the system getopt is
# API-compatible, so we use it instead.
set -e
REF=/root/reference
BUILD=${1:-/tmp/phnrec_oracle}
mkdir -p "$BUILD"
cp "$REF"/*.cpp "$REF"/*.h "$BUILD"/
cd "$BUILD"
sed -i 's|#include "getopt.h"|#include <unistd.h>|' phnrec.cpp
SRCS="melbanks.cpp dspc.cpp traps.cpp nn.cpp configz.cpp alaw.cpp lwfsource.cpp \
      srec.cpp filename.cpp norm.cpp decoder.cpp phndec.cpp sxmlparser.cpp \
      phnrec.cpp"
g++ -o phnrec -I . -fpermissive -Wno-narrowing -D NN_FAST_EXP -D PHNREC_ONLY -O2 \
    $SRCS -lpthread 2>/dev/null
echo "oracle built: $BUILD/phnrec"
