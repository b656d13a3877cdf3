#!/bin/bash
# Build the FULL reference PhnRec (with the bundled STKLib) as a test
# oracle, OUTSIDE the repo (never shipped).  Unlike build_oracle.sh's lean
# PHNREC_ONLY build, this links the STK token-passing engine, so the
# stkint decoder and KWS modes can be golden-tested against the real thing.
#
# Portability patches for modern g++ (the code is 2004-era):
#   * bundled getopt.h conflicts with glibc -> system unistd.h
#   * STK stkstream: IStkStream/OStkStream multiple-inheritance ctors no
#     longer leave the iostream bound to the custom buffer; re-init(&buf)
#     in each ctor (old libstdc++ tolerated the stale binding)
#   * imagesc (Motif GUI) and labelreader (iterator != NULL) are not
#     needed by phnrec and are left out of the link
set -e
REF=/root/reference
BUILD=${1:-/tmp/phnrec_full}
mkdir -p "$BUILD"
cp "$REF"/*.cpp "$REF"/*.h "$BUILD"/ 2>/dev/null
mkdir -p "$BUILD/STKLib"
cp "$REF"/STKLib/*.cc "$REF"/STKLib/*.C "$REF"/STKLib/*.h \
   "$REF"/STKLib/*.tcc "$BUILD/STKLib/" 2>/dev/null
cd "$BUILD"
sed -i 's|#include "getopt.h"|#include <unistd.h>|' phnrec.cpp
# Latent reference bug: srec.cpp sets the decoder mode AFTER LoadNetwork
# (srec.cpp:637,668+), but StkInterface::LoadNetwork only discovers the
# KWS filler/keyword-end nodes when mode is already DECMODE_KWS
# (stkinterface.cpp:106-155) — config-driven KWS therefore dereferences
# an uninitialized filler_end and crashes.  The oracle restores the
# intended order so the LRTrace semantics can actually be exercised.
sed -i 's|DE = (Decoder \*)new StkInterface;|DE = (Decoder *)new StkInterface;\n\t\t\t\tif(strcmp(C.GetString("decoder", "mode"), "kws") == 0) DE->SetMode(DECMODE_KWS);|' srec.cpp
sed -i \
 -e 's|IStkStream() : stkios() {};|IStkStream() : stkios() { this->init(\&this->buf); };|' \
 -e 's|OStkStream() : stkios() {};|OStkStream() : stkios() { this->init(\&this->buf); };|' \
 -e 's|stkios() {this->open(fName, ios::in, filter);}|stkios() { this->init(\&this->buf); this->open(fName, ios::in, filter);}|' \
 -e 's|      stkios(fName, m, filter) {}|      stkios(fName, m, filter) { this->init(\&this->buf); }|' \
 STKLib/stkstream.h

CFLAGS="-O1 -fpermissive -Wno-narrowing -Wno-write-strings -Wno-format-security \
        -DDOUBLEPRECISION=0 -D_REENTRANT -I STKLib"
for f in common.C Buffer.cc Error.cc Matrix.cc Models.cc Models_IO.cc \
         Net.cc Net_IO.cc StkMath.cc Viterbi.cc dict.C fileio.C filmatch.C \
         labels.C; do
  g++ -c $CFLAGS -o "STKLib/${f%.*}.o" "STKLib/$f" 2>/dev/null
done

g++ -o phnrec_full -I . -I STKLib $CFLAGS -D NN_FAST_EXP \
  melbanks.cpp plp.cpp dspc.cpp traps.cpp nn.cpp configz.cpp alaw.cpp \
  lwfsource.cpp srec.cpp filename.cpp norm.cpp decoder.cpp phndec.cpp \
  sxmlparser.cpp stkinterface.cpp netgen.cpp kwsnetg.cpp lexicon.cpp \
  gptrans.cpp phntrans.cpp phntranscheck.cpp thresholds.cpp fsm.cpp \
  fsmcache.cpp myrand.cpp encode.cpp phnrec.cpp \
  STKLib/common.o STKLib/Buffer.o STKLib/Error.o STKLib/Matrix.o \
  STKLib/Models.o STKLib/Models_IO.o STKLib/Net.o STKLib/Net_IO.o \
  STKLib/StkMath.o STKLib/Viterbi.o STKLib/dict.o STKLib/fileio.o \
  STKLib/filmatch.o STKLib/labels.o \
  -lpthread 2>/dev/null
echo "full oracle built: $BUILD/phnrec_full"
