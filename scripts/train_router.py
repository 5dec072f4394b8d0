#!/usr/bin/env python
"""Train the chaining device/host cost-model constants.

The analogue of the reference's hw_sw_split/ trainer
(find_hw_sw_split_params.sh + find_params.py): run every task on BOTH the
device kernel and the host DP, record
    n  total_subparts  total_trip_count  dev_ms  host_ms
per task (the reference prints these as 'param ...' lines, chain.c:264-333),
then least-squares fit the five constants of the two linear predictors and
write them as JSON for `mm2tpu --router-params`.

Usage:
    python scripts/train_router.py [-o router_params.json] [--reps 3]

Run on the target TPU host; off-TPU the Pallas kernel runs in interpret
mode and the fitted constants describe the CPU interpreter instead.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_task(n: int, density: float, rng) -> np.ndarray:
    """Anchor array shaped like real chaining input: x-sorted, uint64
    packed (rid|pos in x; span|qpos in y)."""
    lo = np.sort(rng.integers(0, int(n / density), n)).astype(np.uint64)
    qi = np.clip(lo.astype(np.int64) + rng.integers(-400, 400, n),
                 0, None).astype(np.uint64)
    a = np.zeros((n, 2), np.uint64)
    a[:, 0] = lo
    a[:, 1] = (np.uint64(15) << np.uint64(32)) | qi
    return a


# per-regime task distributions, mirroring the reference's two trained
# constant sets (chain_hardware.h:18-30): read mapping (ONT-class) sees
# moderate-density tasks over a spread of sizes; asm-to-ref (asm5/10/20,
# HiFi-class) sees much denser near-collinear tasks (k=19 minimizers on
# near-identical sequence -> an anchor every ~w bp) skewed to larger n.
_REGIMES = {
    "map": {"ns": (512, 1024, 2048, 4096, 8192, 16384, 32768),
            "densities": (0.05, 0.3, 1.0)},
    "asm20": {"ns": (256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536),
              "densities": (0.5, 1.0, 2.0)},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="router_params.json")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-dist-x", type=int, default=5000)
    ap.add_argument("--regime", choices=sorted(_REGIMES), default="map")
    args = ap.parse_args()

    from mm2tpu.mapping.costmodel import fit_cost_model
    from mm2tpu.ops import chain_ref
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_tpu_v2

    try:
        from mm2tpu.native import lib as native_lib
        host = (native_lib.chain_scores_exact
                if native_lib.available() else None)
    except Exception:
        host = None
    if host is None:
        host = chain_ref.chain_scores_exact

    rng = np.random.default_rng(0)
    rows = []
    reg = _REGIMES[args.regime]

    # measure the dispatch floor directly: a minimal device launch bounds
    # c_dev from below — the physical constraint the fit must respect
    # (an unconstrained regression on collinear n/subparts columns can
    # push the floor into the slopes; VERDICT r4's degenerate asm fit)
    tiny = synth_task(64, 1.0, rng)
    chain_scores_tpu_v2(tiny, args.max_dist_x, 5000, 500, 1024, 1.0,
                        False, 1)  # warm-up compile
    floor_ms = min(_time(lambda: chain_scores_tpu_v2(
        tiny, args.max_dist_x, 5000, 500, 1024, 1.0, False, 1))
        for _ in range(max(args.reps, 5)))
    print("dispatch floor (n=64 launch): %.3f ms" % floor_ms,
          file=sys.stderr)

    print("n\tsubparts\ttripcount\tdev_ms\thost_ms", file=sys.stderr)
    for n in reg["ns"]:
        for density in reg["densities"]:
            a = synth_task(n, density, rng)
            _, total_sub, total_trip = chain_ref.num_subparts(
                a, args.max_dist_x)
            # warm up the device compile, then time best-of-reps
            chain_scores_tpu_v2(a, args.max_dist_x, 5000, 500, 1024,
                                1.0, False, 1)
            t_dev = min(_time(lambda: chain_scores_tpu_v2(
                a, args.max_dist_x, 5000, 500, 1024, 1.0, False, 1))
                for _ in range(args.reps))
            t_host = min(_time(lambda: host(
                a, args.max_dist_x, 5000, 500, 25, 5000, 1.0, False, 1))
                for _ in range(args.reps))
            rows.append((n, total_sub, total_trip, t_dev, t_host))
            print("param\t%d\t%d\t%d\t%.3f\t%.3f"
                  % (n, total_sub, total_trip, t_dev, t_host),
                  file=sys.stderr)

    model = fit_cost_model(rows, floor_dev_ms=0.9 * floor_ms)
    model.save(args.out)
    print("t_dev[ms]  ~= %.4g*n + %.4g*subparts + %.4g"
          % (model.k1_dev, model.k2_dev, model.c_dev), file=sys.stderr)
    print("t_host[ms] ~= %.4g*tripcount + %.4g"
          % (model.k_host, model.c_host), file=sys.stderr)
    print("wrote %s" % args.out, file=sys.stderr)
    return 0


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return (time.perf_counter() - t0) * 1e3


if __name__ == "__main__":
    sys.exit(main())
