#!/bin/bash
# Build the reference fork in software-only mode (OpenCL host stubbed so
# chain.c always takes its SW fallback — bit-identical to upstream
# minimap2 2.18-r1015; see /root/reference/chain.c:105-164). Produces
# $BIN (default /tmp/golden/minimap2-golden) plus the ksw2 oracle .so
# consumed by tests/ksw2_oracle.py.
set -e
REF=${REF:-/root/reference}
DIR=${DIR:-/tmp/golden}
BIN=${BIN:-$DIR/minimap2-golden}
mkdir -p "$DIR"
cd "$DIR"

# minimal OpenCL typedef shim so chain_hardware.h parses without a runtime
cat > xcl2.hpp <<'EOF'
#pragma once
typedef long long cl_long;
typedef int cl_int;
typedef float cl_float;
typedef unsigned char cl_uchar;
typedef struct { cl_long s[2]; } cl_long2;
typedef struct { unsigned long long s[2]; } cl_ulong2;
EOF

cat > hw_stub.cpp <<'EOF'
// software-only stub of the OpenCL host layer: hardware_init succeeds,
// run_chaining_on_hw reports "HW busy" (1) so every task falls back to
// the exact software DP (chain_hardware.h:68-71 prototypes).
#include <string>
using std::string;
#include "minimap.h"
#include "chain_hardware.h"
bool hardware_init(long, char*) { return true; }
int run_chaining_on_hw(cl_long, cl_int, cl_int, cl_int, cl_int, cl_float,
                       mm128_t*, cl_int*, cl_int*, cl_uchar*, cl_long,
                       int, float, float) { return 1; }
void cleanup() {}
EOF

cp "$REF"/{ksw2.h,kalloc.h,kalloc.c,ksw2_extz2_sse.c,ksw2_extd2_sse.c,ksw2_exts2_sse.c,ksw2_ll_sse.c} .

g++ -O2 -msse4.1 -I. -I"$REF" -DHAVE_KALLOC -o "$BIN" \
    "$REF"/main.c "$REF"/options.c "$REF"/index.c "$REF"/sketch.c \
    "$REF"/map.c "$REF"/chain.c "$REF"/hit.c "$REF"/align.c \
    "$REF"/format.c "$REF"/bseq.c "$REF"/esterr.c "$REF"/pe.c \
    "$REF"/sdust.c "$REF"/splitidx.c "$REF"/misc.c "$REF"/kalloc.c \
    "$REF"/kthread.c ksw2_extz2_sse.c ksw2_extd2_sse.c ksw2_exts2_sse.c \
    ksw2_ll_sse.c hw_stub.cpp -lz -lpthread -lm

g++ -O2 -msse4.1 -shared -fPIC -I. -o "$DIR"/libksw2oracle.so \
    -x c ksw2_extd2_sse.c ksw2_extz2_sse.c ksw2_ll_sse.c \
    ksw2_exts2_sse.c kalloc.c

echo "built $BIN"
