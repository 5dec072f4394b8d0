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
     byte sizes vs the 16 GB of a v5e chip),
  6. with --device (VERDICT r2 item 5): on-chip device-chaining
     (--map-mode batch) and device-seeded (--seed-backend tpu) runs
     against the same MMX — parity vs the host path, per-bucket dispatch
     time from the --profile stage table, and live HBM bytes_in_use with
     the probe arrays resident.

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


def run_cli(args, out_path=None, return_stderr=False):
    """Run the CLI in a subprocess (isolates peak RSS per phase)."""
    cmd = [sys.executable, "-m", "mm2tpu.cli"] + args
    t0 = time.time()
    with open(out_path or os.devnull, "w") as f:
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.PIPE, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    dt = time.time() - t0
    return (dt, r.stderr) if return_stderr else dt


def parse_prof(stderr):
    """[PROF] stage table -> {stage: (total_s, calls, ms_per_call)}."""
    out = {}
    for ln in stderr.splitlines():
        if not ln.startswith("[PROF] ") or ln.startswith("[PROF] stage") \
                or " SUM " in ln or "trace written" in ln:
            continue
        parts = ln.split()
        if len(parts) == 5:
            try:
                out[parts[1]] = (float(parts[2]), int(parts[3]),
                                 float(parts[4]))
            except ValueError:
                pass
    return out


def device_runs(res, idx, reads, paf1, out_dir):
    """On-chip genome-scale runs (VERDICT r2 item 5): device-chaining and
    device-seeded paths against a large MMX index on the real chip, with
    HBM residency of the probe arrays and per-bucket dispatch timings
    from the --profile stage table."""
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        log("no TPU attached; skipping device runs")
        return

    # HBM residency: land the probe arrays on the chip, read live stats
    from mm2tpu.index.build import load_index
    mi = load_index(idx)
    dev = jax.devices()[0]
    bufs = [jax.device_put(a, dev) for a in
            (mi.keys, mi.start, mi.cnt, mi.pos)]
    for b in bufs:
        b.block_until_ready()
    try:
        st = dev.memory_stats()
        res["hbm_bytes_in_use"] = int(st.get("bytes_in_use", 0))
        res["hbm_bytes_limit"] = int(st.get("bytes_limit", 0))
    except Exception:
        res["hbm_bytes_in_use"] = sum(int(a.nbytes) for a in bufs)
    del bufs, mi

    host_paf = open(paf1).read()

    # in-process runs: compiled XLA/Mosaic programs stay loaded between
    # the cold and steady passes (on the axon tunnel attachment the
    # persistent compile cache does not cover the remote Mosaic
    # compiles, so a fresh subprocess re-pays ~25 s per kernel shape —
    # the steady numbers here are what a resident service sees)
    import io as _io
    import time as _time
    from contextlib import redirect_stdout

    from mm2tpu.cli import main as cli_main
    from mm2tpu.utils import profiling

    def run_inproc(cli_args, profile=False):
        if profile:
            profiling.enable()
        buf = _io.StringIO()
        t0 = _time.time()
        with redirect_stdout(buf):
            rc = cli_main(cli_args)
        dt = _time.time() - t0
        assert rc == 0, cli_args
        prof = {}
        if profile:
            prof = {k: v for k, v in profiling.snapshot().items()}
            profiling.disable()
        return dt, buf.getvalue(), prof

    log("device-chaining batch run on chip (--map-mode batch)...")
    t_cold, out_cold, _ = run_inproc(
        ["-x", "map-ont", "--map-mode", "batch", idx, reads])
    t_dev, out_dev, prof = run_inproc(
        ["-x", "map-ont", "--map-mode", "batch", idx, reads], profile=True)
    res["device_batch_cold_s"] = round(t_cold, 1)
    res["device_batch_s"] = round(t_dev, 1)
    res["device_batch_parity"] = out_dev == host_paf and out_cold == host_paf
    if "chain.device" in prof:
        sec, calls = prof["chain.device"]
        res["device_batch_dispatch_ms_per_bucket"] = round(
            sec * 1e3 / max(calls, 1), 1)
        res["device_batch_dispatches"] = calls
    res["device_batch_prof"] = {k: round(v[0], 3) for k, v in prof.items()}

    log("device-seeded run on chip (--seed-backend tpu)...")
    run_inproc(["-x", "map-ont", "--map-mode", "batch", "--seed-backend",
                "tpu", idx, reads])
    t_seed, out_seed, prof = run_inproc(
        ["-x", "map-ont", "--map-mode", "batch", "--seed-backend", "tpu",
         idx, reads], profile=True)
    res["device_seed_s"] = round(t_seed, 1)
    res["device_seed_parity"] = out_seed == host_paf
    res["device_seed_prof"] = {k: round(v[0], 3) for k, v in prof.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=300)
    ap.add_argument("--reads", type=int, default=300)
    ap.add_argument("--out-dir", default="/tmp/mm2tpu_scale")
    ap.add_argument("--skip-multipart", action="store_true")
    ap.add_argument("--skip-mmi", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="also run the device-chaining and device-seeded "
                         "paths on the attached TPU chip (parity + "
                         "per-bucket dispatch profile + HBM residency)")
    args = ap.parse_args()

    from make_workload import make
    os.makedirs(args.out_dir, exist_ok=True)
    res = {"genome_mb": args.genome_mb, "n_reads": args.reads}

    log("generating %g Mb genome + %d reads..." % (args.genome_mb,
                                                   args.reads))
    t0 = time.time()
    ref, reads = make(args.out_dir, args.genome_mb, args.reads)
    res["workload_gen_s"] = round(time.time() - t0, 1)

    # size-keyed artifact names: the resume-reuse must never hand a
    # 300 Mb index to a 3 Gb run sharing the out-dir
    idx = os.path.join(args.out_dir, "scale_g%dm.mmx" % int(args.genome_mb))
    if not os.path.exists(idx):  # resumable: long runs on a shared box
        log("index build from FASTA -> MMX...")
        res["index_build_s"] = round(
            run_cli(["-x", "map-ont", "-d", idx, ref]), 1)
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

    if args.device:
        device_runs(res, idx, reads, paf1, args.out_dir)

    if not args.skip_mmi:
        log(".mmi dump + reload interop...")
        mmi = os.path.join(args.out_dir,
                           "scale_g%dm.mmi" % int(args.genome_mb))
        res["mmi_dump_s"] = round(run_cli(["-x", "map-ont", "-d", mmi,
                                           ref]), 1)
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
