#!/usr/bin/env python
"""Genome-scale validation driver (VERDICT r1 item 3).

Builds a large synthetic genome (default 300 Mb — hg38-class structure at
1/10 size; use --genome-mb 3000 for the full hg38 scale on a big host),
then measures and checks:

  1. index build time from FASTA (+ native finalize path),
  2. MMX (device-ready mmap) dump/load round-trip time + mapping parity,
  3. reference-format .mmi dump + reload interop,
  4. -I multipart build + --split-prefix merge parity vs the single-part
     run (the reference's capacity-splitting semantics, index.c:586-605),
  5. HBM residency report for the device probe arrays (keys/start/cnt/pos
     byte sizes vs the 16 GB of a v5e chip).

Prints one JSON summary line; detailed timings on stderr.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(msg):
    print("[scale] %s" % msg, file=sys.stderr, flush=True)


def run_cli(args, out_path=None):
    """Run the CLI in a subprocess (isolates peak RSS per phase)."""
    cmd = [sys.executable, "-m", "mm2tpu.cli"] + args
    t0 = time.time()
    with open(out_path or os.devnull, "w") as f:
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.PIPE, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=300)
    ap.add_argument("--reads", type=int, default=300)
    ap.add_argument("--out-dir", default="/tmp/mm2tpu_scale")
    ap.add_argument("--skip-multipart", action="store_true")
    args = ap.parse_args()

    from make_workload import make
    os.makedirs(args.out_dir, exist_ok=True)
    res = {"genome_mb": args.genome_mb, "n_reads": args.reads}

    log("generating %g Mb genome + %d reads..." % (args.genome_mb,
                                                   args.reads))
    t0 = time.time()
    ref, reads = make(args.out_dir, args.genome_mb, args.reads)
    res["workload_gen_s"] = round(time.time() - t0, 1)

    idx = os.path.join(args.out_dir, "scale.mmx")
    log("index build from FASTA -> MMX...")
    res["index_build_s"] = round(run_cli(["-x", "map-ont", "-d", idx, ref]),
                                 1)
    res["mmx_bytes"] = os.path.getsize(idx)

    log("MMX load + HBM residency...")
    t0 = time.time()
    from mm2tpu.index.build import load_index
    mi = load_index(idx)
    res["mmx_load_s"] = round(time.time() - t0, 3)
    probe_bytes = (mi.keys.nbytes + mi.start.nbytes + mi.cnt.nbytes +
                   mi.pos.nbytes)
    res["device_probe_bytes"] = int(probe_bytes)
    res["fits_v5e_hbm"] = bool(probe_bytes < 12e9)  # 16 GB minus headroom
    res["distinct_minimizers"] = int(len(mi.keys))
    del mi

    log("map from MMX (host path)...")
    paf1 = os.path.join(args.out_dir, "single.paf")
    res["map_mmx_s"] = round(
        run_cli(["-x", "map-ont", "-t", "1", idx, reads], paf1), 1)

    log(".mmi dump + reload interop...")
    mmi = os.path.join(args.out_dir, "scale.mmi")
    res["mmi_dump_s"] = round(run_cli(["-x", "map-ont", "-d", mmi, ref]), 1)
    paf2 = os.path.join(args.out_dir, "mmi.paf")
    res["map_mmi_s"] = round(
        run_cli(["-x", "map-ont", "-t", "1", mmi, reads], paf2), 1)
    res["mmi_parity"] = open(paf1).read() == open(paf2).read()

    if not args.skip_multipart:
        part_mb = max(32, int(args.genome_mb / 4))
        log("-I %dM multipart + --split-prefix merge..." % part_mb)
        paf3 = os.path.join(args.out_dir, "multipart.paf")
        sp = os.path.join(args.out_dir, "sp")
        mp_flags = ["-x", "map-ont", "-t", "1", "-I", "%dM" % part_mb,
                    "--split-prefix", sp]
        res["multipart_s"] = round(run_cli(mp_flags + [ref, reads], paf3), 1)
        # multipart output legitimately differs from single-part (per-part
        # mid_occ); the parity oracle is the reference binary on the SAME
        # flags, when available
        golden = "/tmp/golden/minimap2-golden"
        if os.path.exists(golden):
            paf4 = os.path.join(args.out_dir, "multipart_ref.paf")
            t0 = time.time()
            with open(paf4, "w") as f:
                subprocess.run([golden] + mp_flags + [ref, reads], stdout=f,
                               stderr=subprocess.DEVNULL, check=True)
            res["multipart_ref_s"] = round(time.time() - t0, 1)
            res["multipart_parity_vs_reference"] = \
                open(paf3).read() == open(paf4).read()
        else:
            res["multipart_lines"] = sum(1 for _ in open(paf3))

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
