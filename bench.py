"""Benchmark: anchor-chaining throughput on the TPU chip (device compute).

Methodology: K kernel invocations chained inside one jit (each consuming a
checksum of the previous results, so XLA cannot reorder or elide them),
tiny scalar readback; per-invocation time = (T(K) - T(1)) / (K - 1). This
isolates device compute from the host<->device transport, which in this
environment is a high-latency tunnel.

Prints one JSON line. Baseline: the reference fork's trained AWS F1 FPGA
time model for ONT chaining (chain_hardware.h:19-21):
    t_hw[ms] = 2.992e-4*n + 1.215e-5*total_subparts + 0.3194
With 8 subparts/anchor (dense windows, the regime benchmarked here) the
FPGA rate is 1e3 / (2.992e-4 + 8*1.215e-5) ~= 2.52e6 anchors/s per F1 card.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

F1_ANCHORS_PER_S = 1e3 / (2.992e-4 + 8 * 1.215e-5)  # ms -> ~2.52M anchors/s


def main():
    import jax
    import jax.numpy as jnp
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_device_v2

    B, N = 32, 8192  # 32 ONT-like chaining tasks of 8k anchors
    rng = np.random.default_rng(0)
    # dense anchor geometry: windows saturate the 1024 lookback cap,
    # matching the FPGA's full-subpart regime
    lo = np.sort(rng.integers(0, 4 * N, (B, N)), axis=1).astype(np.int32)
    qi = np.clip(lo + rng.integers(-400, 400, (B, N)), 0, None).astype(np.int32)
    hi = np.zeros((B, N), np.int32)
    span = np.full((B, N), 15, np.int32)
    sid = np.zeros((B, N), np.int32)
    n = np.full((B, 1), N, np.int32)
    avg = np.full((B, 1), 0.15, np.float32)

    kwargs = dict(max_dist_x=5000, max_dist_y=5000, bw=500, iter_cap=1024,
                  gap_scale=1.0, is_cdna=False, n_segs=1,
                  interpret=jax.default_backend() != "tpu")

    def harness(K):
        @jax.jit
        def run(x):
            acc = jnp.int32(0)
            for _ in range(K):
                f, p = chain_scores_device_v2(hi, x, qi, span, sid, n, avg,
                                              **kwargs)
                acc = acc + f[0, 0] + p[-1, -1] + f[B // 2, N // 2]
                x = x + (acc & 1)  # serialize invocations
            return acc
        return run

    K = 9
    r1, rk = harness(1), harness(K)
    float(r1(lo))
    float(rk(lo))
    reps = 5

    def best(run):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(run(lo))
            ts.append(time.time() - t0)
        return min(ts)  # min-of-reps: robust to host/tunnel jitter

    t1 = best(r1)
    tk = best(rk)

    per_invocation = (tk - t1) / (K - 1)
    rate = B * N / per_invocation
    print(json.dumps({
        "metric": "chaining_anchors_per_s",
        "value": round(rate, 1),
        "unit": "anchors/s",
        "vs_baseline": round(rate / F1_ANCHORS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
