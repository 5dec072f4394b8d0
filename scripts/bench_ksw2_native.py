"""Microbenchmark: native mm2_ksw_extd2 vs the reference SSE oracle
(ksw2_extd2_sse.c compiled into /tmp/golden/libksw2oracle.so) on the fill
shapes the align path actually issues (small seed-gap fills dominate;
ends are EXTZ_ONLY extensions). Reports ns/call and the per-call ratio.

Run from the repo root: python scripts/bench_ksw2_native.py
"""
import ctypes
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from mm2tpu.native import lib as native_lib          # noqa: E402
from mm2tpu.ops.ksw2_ref import (KSW_EZ_APPROX_MAX as EZ_APPROX_MAX,  # noqa: E402,E501
                                 KSW_EZ_APPROX_DROP as EZ_APPROX_DROP,
                                 KSW_EZ_EXTZ_ONLY as EZ_EXTZ_ONLY)

sys.path.insert(0, "tests")
import ksw2_oracle                                   # noqa: E402

MAT = np.array([2, -4, -4, -4, 0,
                -4, 2, -4, -4, 0,
                -4, -4, 2, -4, 0,
                -4, -4, -4, 2, 0,
                0, 0, 0, 0, 0], np.int8)
# map-ont scoring: q=4 e=2 q2=24 e2=1 zdrop=400 bw=500


def mkpair(rng, qlen, tlen, div=0.12):
    t = rng.integers(0, 4, tlen).astype(np.uint8)
    q = t[:qlen].copy()
    nmut = int(qlen * div)
    idx = rng.integers(0, qlen, nmut)
    q[idx] = (q[idx] + rng.integers(1, 4, nmut)) % 4
    return q, t


def bench(fn, reps):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts) * 1e9


def main():
    rng = np.random.default_rng(0)
    w = 500
    zdrop = 400
    # flag mix mirrors mapping/align.py: seed-gap fills run with
    # APPROX_MAX (first zdrop pass), end extensions with EXTZ_ONLY (exact)
    cases = [
        ("fill 32x32 approx", *mkpair(rng, 32, 32), EZ_APPROX_MAX),
        ("fill 100x100 approx", *mkpair(rng, 100, 100), EZ_APPROX_MAX),
        ("fill 400x400 approx", *mkpair(rng, 400, 400), EZ_APPROX_MAX),
        ("fill 1500x1500 approx", *mkpair(rng, 1500, 1500), EZ_APPROX_MAX),
        ("ext 300x350 extz-only exact", *mkpair(rng, 300, 350),
         EZ_EXTZ_ONLY),
        ("ext 1200x1300 extz-only exact", *mkpair(rng, 1200, 1300),
         EZ_EXTZ_ONLY),
    ]
    print(f"{'case':34s} {'native ns':>12s} {'oracle ns':>12s} {'ratio':>7s}")
    tot_n = tot_o = 0.0
    for name, q, t, flag in cases:
        reps = max(3, int(2e6 / (len(q) * 2)))
        n_ns = bench(lambda: native_lib.ksw_extd2(
            len(q), q, len(t), t, MAT, 4, 2, 24, 1, w, zdrop, 0, flag), reps)
        o_ns = bench(lambda: ksw2_oracle.extd2(
            q, t, MAT, 4, 2, 24, 1, w, zdrop, 0, flag), reps)
        tot_n += n_ns
        tot_o += o_ns
        print(f"{name:34s} {n_ns:12.0f} {o_ns:12.0f} {n_ns / o_ns:7.2f}")
    print(f"{'TOTAL':34s} {tot_n:12.0f} {tot_o:12.0f} {tot_n / tot_o:7.2f}")


if __name__ == "__main__":
    main()
