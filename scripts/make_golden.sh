#!/bin/bash
# Regenerate golden outputs from the reference fork compiled in software-only
# mode (OpenCL host stubbed so chain.c always takes its SW fallback, which is
# bit-identical to upstream minimap2 2.18-r1015 chaining; see
# /root/reference/chain.c:105-164).
#
# Build recipe for $BIN (from /tmp/golden):
#   1. write xcl2.hpp containing only the cl_* scalar typedefs
#      (cl_long=long long, cl_int=int, cl_float=float, cl_uchar=unsigned
#      char) so chain_hardware.h parses without OpenCL,
#   2. write hw_stub.cpp defining hardware_init->true, cleanup->{}, and
#      run_chaining_on_hw->1 (the "HW busy" return, forcing SW fallback),
#   3. g++ -O2 -msse4.1 -I. -I/root/reference -DHAVE_KALLOC -o
#      minimap2-golden /root/reference/{main,options,index,sketch,map,
#      chain,hit,align,format,bseq,esterr,pe,sdust,splitidx,misc,kalloc,
#      kthread,ksw2_extz2_sse,ksw2_extd2_sse,ksw2_exts2_sse,
#      ksw2_ll_sse}.c hw_stub.cpp -lz -lpthread -lm
set -e
BIN=${BIN:-/tmp/golden/minimap2-golden}
T=/root/reference/test
G=$(dirname $0)/../tests/golden
run() { out=$1; shift; $BIN "$@" 2>/dev/null > $G/$out; }
run mapont_MT.paf      -x map-ont $T/MT-orang.fa $T/MT-human.fa
run mappb_MT.paf       -x map-pb  $T/MT-orang.fa $T/MT-human.fa
run asm5_MT.paf        -x asm5    $T/MT-orang.fa $T/MT-human.fa
run asm20_MT.paf       -x asm20   $T/MT-orang.fa $T/MT-human.fa
cat $T/MT-human.fa $T/MT-orang.fa > /tmp/ava_reads.fa
run avaont_MT.paf      -x ava-ont /tmp/ava_reads.fa /tmp/ava_reads.fa
run default_MT.paf               $T/MT-orang.fa $T/MT-human.fa
run mapont_MT_c.paf    -x map-ont -c $T/MT-orang.fa $T/MT-human.fa
run mapont_MT_cs.paf   -x map-ont -c --cs $T/MT-orang.fa $T/MT-human.fa
run asm20_MT_c.paf     -x asm20 -c $T/MT-orang.fa $T/MT-human.fa
run mapont_MT_a.sam    -x map-ont -a $T/MT-orang.fa $T/MT-human.fa
run q2t2_a.sam         -a $T/t2.fa $T/q2.fa
run q2t2_splice.paf    -x splice -c --cs -k10 -w3 -m10 -n1 -s10 $T/t2.fa $T/q2.fa
run q2t2_splice_a.sam  -x splice -a -k10 -w3 -m10 -n1 -s10 $T/t2.fa $T/q2.fa
run q2t2_k10.paf       -c -k10 -w3 -m10 -n1 -s10 $T/t2.fa $T/q2.fa
run qinv_a.sam         -a $T/t-inv.fa $T/q-inv.fa
run qinv_cs.paf        -c --cs $T/t-inv.fa $T/q-inv.fa
printf 't2\t0\t74\tx1\t50\t+\t0\t74\t0\t2\t19,20\t0,54\n' > $G/t2_junc.bed
run q2t2_splice_junc.paf -x splice -c --cs -k10 -w3 -m10 -n1 -s10 --junc-bed $G/t2_junc.bed $T/t2.fa $T/q2.fa
run mapont_MT_md.sam   -x map-ont -a --MD $T/MT-orang.fa $T/MT-human.fa
run mapont_MT_eqx.sam  -x map-ont -a --eqx $T/MT-orang.fa $T/MT-human.fa
# per-stage anchor dumps (SD = sorted anchors pre-chain, CN = per-chain anchors)
$BIN -x map-ont --print-seeds $T/MT-orang.fa $T/MT-human.fa 2> $G/mapont_MT.seeds >/dev/null
$BIN -x map-pb  --print-seeds $T/MT-orang.fa $T/MT-human.fa 2> $G/mappb_MT.seeds  >/dev/null
# binary .mmi index dumps
$BIN -x map-ont -d $G/mapont_MTorang.mmi $T/MT-orang.fa >/dev/null 2>&1
$BIN -x map-pb  -d $G/mappb_MTorang.mmi  $T/MT-orang.fa >/dev/null 2>&1
# ksw2 oracle shared library for differential tests (tests/test_ksw2.py)
(cd /tmp/golden && g++ -O2 -msse4.1 -shared -fPIC -I. -o libksw2oracle.so \
    -x c ksw2_extd2_sse.c ksw2_extz2_sse.c ksw2_ll_sse.c ksw2_exts2_sse.c)
# paired-end short-read fixtures (reads simulated by tests; see repo history)
run sr_pe_MT.paf       -x sr $T/MT-orang.fa $G/sr_reads_1.fq $G/sr_reads_2.fq
run sr_pe_MT.sam       -x sr -a $T/MT-orang.fa $G/sr_reads_1.fq $G/sr_reads_2.fq
run sr_se_MT.paf       -x sr $T/MT-orang.fa $G/sr_reads_1.fq
# multi-part index + split-prefix merge fixtures (twopart_MT.mmi is a
# 2-part .mmi written by mm2tpu's writer: MT-human part 0, MT-orang part 1)
run twopart_nosplit.paf          $G/twopart_MT.mmi $G/sr_reads_1.fq $T/MT-human.fa
run twopart_split.paf            --split-prefix /tmp/sp_g1 $G/twopart_MT.mmi $G/sr_reads_1.fq
run twopart_split.sam            -a --split-prefix /tmp/sp_g2 $G/twopart_MT.mmi $G/sr_reads_1.fq
run twopart_split_c.paf          -c --split-prefix /tmp/sp_g3 $G/twopart_MT.mmi $T/MT-human.fa
echo "golden fixtures written to $G"
