"""Differential tests: Pallas chaining kernel vs the NumPy windowed oracle
(the VERIFY_OUTPUT pattern of the reference, chain.c:244-262).

Runs in interpreter mode on the CPU test mesh; the same kernel compiles
for TPU (exercised by bench.py on hardware).
"""
import numpy as np
import pytest

from mm2tpu.ops.chain_ref import chain_scores_window, chain_scores_exact


def synth_anchors(n, seed=0, n_rids=1, rev_frac=0.0, span=15, scale=50):
    rng = np.random.default_rng(seed)
    refpos = np.sort(rng.integers(0, scale * n, n))
    qpos = np.clip(refpos + rng.integers(-400, 400, n), 0, None)
    rid = rng.integers(0, n_rids, n).astype(np.uint64)
    strand = (rng.random(n) < rev_frac).astype(np.uint64)
    x = (strand << np.uint64(63)) | (rid << np.uint64(32)) | refpos.astype(np.uint64)
    y = (np.uint64(span) << np.uint64(32)) | qpos.astype(np.uint64)
    a = np.stack([x, y], axis=1)
    return a[np.argsort(a[:, 0], kind="stable")]


CASES = [
    dict(n=500, seed=1),
    dict(n=2000, seed=2, n_rids=3, rev_frac=0.3),
    dict(n=3000, seed=3, scale=2),     # dense: windows hit the 1024 cap
    dict(n=1024, seed=4, scale=1),     # ties and zero-distance cases
]


def test_window_matches_exact_when_unconstrained():
    """With no max_skip pressure and windows < 1024, the bounded-lookback DP
    equals the exact SW DP (chain.c VERIFY assumption)."""
    a = synth_anchors(n=600, seed=6, scale=200)  # sparse: small windows
    f1, p1, v1 = chain_scores_exact(a, 5000, 5000, 500, 25, 5000, 1.0, False, 1)
    f2, p2, v2 = chain_scores_window(a, 5000, 5000, 500, 5000, 1.0, False, 1)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(v1, v2)


@pytest.mark.parametrize("case", CASES)
def test_kernel_v2_matches_window_oracle(case):
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_tpu_v2
    a = synth_anchors(**case)
    args = (5000, 5000, 500, 5000, 1.0, False, 1)
    f1, p1, v1 = chain_scores_window(a, *args)
    f2, p2, v2 = chain_scores_tpu_v2(a, *args, interpret=True)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(v1, v2)


def test_kernel_v2_cdna():
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_tpu_v2
    a = synth_anchors(n=800, seed=5)
    args = (200000, 2000, 200000, 5000, 1.0, True, 1)
    f1, p1, v1 = chain_scores_window(a, *args)
    f2, p2, v2 = chain_scores_tpu_v2(a, *args, interpret=True)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(p1, p2)


def test_kernel_v2_rows_per_program_identical():
    """R-interleaved variant (latency hiding, docs/ROOFLINE.md) is
    bit-identical to the R=1 kernel."""
    import numpy as np
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_device_v2
    from mm2tpu.ops.chain_pallas import pack_anchors
    rng = np.random.default_rng(11)
    B, N = 4, 1024
    tiles = []
    for b in range(B):
        a = synth_anchors(N, seed=100 + b, scale=3, rev_frac=0.2)
        tiles.append(pack_anchors(a, N))
    stack = [np.stack([t[i] for t in tiles]) for i in range(5)]
    n = np.full((B, 1), N, np.int32)
    avg = np.full((B, 1), 0.15, np.float32)
    kw = dict(max_dist_x=5000, max_dist_y=5000, bw=500, iter_cap=1024,
              gap_scale=1.0, is_cdna=False, n_segs=1, interpret=True)
    f1, p1 = chain_scores_device_v2(*stack, n, avg, **kw)
    f2, p2 = chain_scores_device_v2(*stack, n, avg, rows_per_program=2,
                                    **kw)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_kernel_v3_matches_v2():
    """v3 (cross-task lanes, natural layout) is bit-identical to v2 on
    uneven multi-rid reverse-strand batches, incl. iter_cap < window."""
    import numpy as np
    from mm2tpu.ops.chain_pallas import pack_anchors
    from mm2tpu.ops.chain_pallas_v2 import chain_scores_device_v2
    from mm2tpu.ops.chain_pallas_v3 import chain_scores_device_v3
    B, N = 8, 2048
    tiles = [pack_anchors(synth_anchors(N - 17 * b, seed=50 + b, n_rids=3,
                                        rev_frac=0.4, scale=2 + b % 3), N)
             for b in range(B)]
    st = [np.stack([t[i] for t in tiles]) for i in range(5)]
    n = np.array([[N - 17 * b] for b in range(B)], np.int32)
    avg = np.full((B, 1), 0.15, np.float32)
    for cap in (1024, 500):
        kw = dict(max_dist_x=5000, max_dist_y=5000, bw=500, iter_cap=cap,
                  gap_scale=1.0, interpret=True)
        f3, p3 = chain_scores_device_v3(st[0], st[1], st[2], st[3], n, avg,
                                        **kw)
        f2, p2 = chain_scores_device_v2(*st, n, avg, is_cdna=False,
                                        n_segs=1, **kw)
        np.testing.assert_array_equal(np.asarray(f2), np.asarray(f3))
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p3))


def test_pack8_decode_matches_pack16():
    """The delta-packed 8 B/anchor up-plane (ops/chain_packed.py
    pack_tasks8/_decode8) must reconstruct EXACTLY the planes the
    16 B/anchor path ships — hi/lo including the pad sentinel region,
    and qi/span/sid within each task."""
    import jax.numpy as jnp

    from mm2tpu.ops.chain_packed import (_decode8, _derive_qss,
                                         pack_tasks8, pack_tasks16)

    rng = np.random.default_rng(7)
    tasks = []
    for n, scale in [(100, 50), (1000, 1), (4000, 200), (0, 1), (1, 1)]:
        if n == 0:
            tasks.append(np.zeros((0, 2), np.uint64))
            continue
        a = synth_anchors(n, seed=n, n_rids=4, rev_frac=0.3, scale=scale)
        # give y realistic seg ids and varied spans
        sid = rng.integers(0, 3, n).astype(np.uint64)
        span = rng.integers(1, 256, n).astype(np.uint64)
        a[:, 1] = (sid << np.uint64(48)) | (span << np.uint64(32)) | \
            (a[:, 1] & np.uint64(0xFFFFFFFF))
        tasks.append(a)
    N = 4096
    hi16, lo16, yhi16, ylo16, n16, avg16 = pack_tasks16(tasks, N)
    p8 = pack_tasks8(tasks, N)
    assert p8 is not None
    d, qi, spansid, ep, ec, eh, n8, avg8 = p8
    assert np.array_equal(n8, n16) and np.array_equal(avg8, avg16)
    hi, lo, qi_d, span_d, sid_d = [np.asarray(v) for v in _decode8(
        jnp.asarray(d), jnp.asarray(qi), jnp.asarray(spansid),
        jnp.asarray(ep), jnp.asarray(ec), jnp.asarray(eh))]
    assert np.array_equal(hi, hi16)
    assert np.array_equal(lo, lo16)
    qi16, span16, sid16 = [np.asarray(v) for v in _derive_qss(
        jnp.asarray(yhi16), jnp.asarray(ylo16))]
    for b, a in enumerate(tasks):
        m = len(a)
        assert np.array_equal(qi_d[b, :m], qi16[b, :m])
        assert np.array_equal(span_d[b, :m], span16[b, :m])
        assert np.array_equal(sid_d[b, :m], sid16[b, :m])
    # wire economy: the whole point
    up8 = d.nbytes + qi.nbytes + spansid.nbytes + ep.nbytes + ec.nbytes \
        + eh.nbytes
    up16 = hi16.nbytes + lo16.nbytes + yhi16.nbytes + ylo16.nbytes
    assert up8 < 0.6 * up16


def test_pack8_exception_overflow_falls_back():
    """A task whose lo deltas overflow uint16 everywhere must exceed the
    top exception-ladder tier and signal fallback (None) rather than
    mis-encode; one that fits the second tier must use it."""
    from mm2tpu.ops.chain_packed import E_LADDER, pack_tasks8

    def task(n):
        pos = np.arange(n, dtype=np.uint64) * np.uint64(1 << 20)
        y = (np.uint64(15) << np.uint64(32)) | np.uint64(7)
        return np.stack([np.sort(pos), np.full(n, y, np.uint64)], axis=1)

    assert pack_tasks8([task(E_LADDER[-1] + 64)], 4096) is None
    p8 = pack_tasks8([task(E_LADDER[0] + 64)], 4096)
    assert p8 is not None
    assert p8[3].shape[1] == E_LADDER[1]  # second tier selected


def test_chain_scores_packed8_matches_packed16():
    """End-to-end through the jitted dispatch wrappers (interpret mode):
    the 8 B and 16 B wire paths must produce identical f/prel."""
    from mm2tpu.ops.chain_packed import (chain_scores_packed,
                                         chain_scores_packed8,
                                         pack_tasks8, pack_tasks16,
                                         pick_lanes)

    tasks = [synth_anchors(900, seed=11, n_rids=2, rev_frac=0.2),
             synth_anchors(300, seed=12),
             np.zeros((0, 2), np.uint64),
             synth_anchors(1024, seed=13, scale=2)]
    tasks += [np.zeros((0, 2), np.uint64)] * (8 - len(tasks))
    N = 1024
    kw = dict(max_dist_x=5000, max_dist_y=5000, bw=500, iter_cap=1024,
              gap_scale=1.0, is_cdna=False, n_segs=1, interpret=True,
              lanes=pick_lanes(8, True))
    f16, p16 = chain_scores_packed(*pack_tasks16(tasks, N), **kw)
    p8 = pack_tasks8(tasks, N)
    assert p8 is not None
    f8, pr8 = chain_scores_packed8(*p8, **kw)
    assert np.array_equal(np.asarray(f8), np.asarray(f16))
    assert np.array_equal(np.asarray(pr8), np.asarray(p16))
