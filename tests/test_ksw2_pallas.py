"""Differential tests: Pallas extd2 kernel vs the host NumPy port.

The host port is itself differentially tested against the reference SSE
kernels (tests/test_ksw2.py), so agreement here means bit-exact minimap2
semantics on device. Runs in interpret mode on the CPU backend; the same
kernel is validated compiled on real TPU hardware (see ops/ksw2_pallas.py).
"""
import numpy as np
import pytest

from mm2tpu.ops import ksw2_ref as K
from mm2tpu.ops.ksw2_pallas import extd2_batch

MAT = K.gen_simple_mat(2, 4, 1)
FIELDS = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
          "mte_q", "score", "reach_end", "cigar")


def mutate(seq, rng, sub=0.1, ind=0.05):
    out = []
    for c in seq:
        r = rng.random()
        if r < sub:
            out.append(rng.integers(0, 4))
        elif r < sub + ind / 2:
            continue
        elif r < sub + ind:
            out.append(int(c))
            out.append(rng.integers(0, 4))
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


def check(tasks, q, e, q2, e2, w, zdrop, end_bonus, flag):
    # both cigar paths: host backtrack AND the device while_loop trace
    # (trace_device) must match the oracle exactly
    res = extd2_batch(tasks, MAT, q=q, e=e, q2=q2, e2=e2, w=w, zdrop=zdrop,
                      end_bonus=end_bonus, flag=flag, interpret=True)
    res_t = extd2_batch(tasks, MAT, q=q, e=e, q2=q2, e2=e2, w=w,
                        zdrop=zdrop, end_bonus=end_bonus, flag=flag,
                        interpret=True, device_trace=True)
    for i, (q8, t8) in enumerate(tasks):
        exp = K.ksw_extd2(len(q8), q8, len(t8), t8, MAT, q, e, q2, e2, w,
                          zdrop, end_bonus, flag)
        for f in FIELDS:
            assert getattr(exp, f) == getattr(res[i], f), (i, f)
            assert getattr(exp, f) == getattr(res_t[i], f), (i, f, "trace")


def global_tasks(rng, n_tasks=4, lo=40, hi=160, with_n=False):
    tasks = []
    for i in range(n_tasks):
        t8 = rng.integers(0, 4, int(rng.integers(lo, hi))).astype(np.uint8)
        q8 = mutate(t8, rng)
        if with_n and len(q8) > 4:
            q8[rng.integers(0, len(q8), 2)] = 4
        tasks.append((q8, t8))
    return tasks


@pytest.mark.parametrize("seed", range(3))
def test_pallas_extd2_global(seed):
    rng = np.random.default_rng(seed)
    check(global_tasks(rng, with_n=seed % 2), 4, 2, 24, 1, 151, 400, -1, 0)


def test_pallas_extd2_right():
    rng = np.random.default_rng(10)
    check(global_tasks(rng), 4, 2, 24, 1, 151, 400, -1, K.KSW_EZ_RIGHT)


@pytest.mark.parametrize("drop", [False, True])
def test_pallas_extd2_approx(drop):
    rng = np.random.default_rng(20 + drop)
    flag = K.KSW_EZ_APPROX_MAX | (K.KSW_EZ_APPROX_DROP if drop else 0)
    check(global_tasks(rng), 4, 2, 24, 1, 151, 200, -1, flag)


def test_pallas_extd2_ext_only():
    """Left/right extension shape: query is a prefix of the target."""
    rng = np.random.default_rng(30)
    tasks = []
    for _ in range(4):
        t8 = rng.integers(0, 4, int(rng.integers(60, 200))).astype(np.uint8)
        tasks.append((mutate(t8[: len(t8) * 2 // 3], rng), t8))
    check(tasks, 4, 2, 24, 1, 151, 400, 10, K.KSW_EZ_EXTZ_ONLY)
    check(tasks, 4, 2, 24, 1, 151, 400, 10,
          K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR)


def test_pallas_extd2_zdrop_break():
    """Divergent tails: the break row and recorded max must match."""
    rng = np.random.default_rng(40)
    tasks = []
    for _ in range(3):
        t8 = rng.integers(0, 4, 220).astype(np.uint8)
        q8 = np.concatenate([mutate(t8[:90], rng),
                             rng.integers(0, 4, 130).astype(np.uint8)])
        tasks.append((q8, t8))
    check(tasks, 4, 2, 24, 1, 300, 100, -1, 0)
    check(tasks, 4, 2, 24, 1, 300, 100, -1,
          K.KSW_EZ_APPROX_MAX | K.KSW_EZ_APPROX_DROP)


def test_pallas_extd2_full_band():
    """w<0 selects the per-task max(qlen,tlen) band."""
    rng = np.random.default_rng(50)
    check(global_tasks(rng, n_tasks=3, lo=30, hi=70), 4, 2, 24, 1, -1,
          400, -1, 0)


def test_pallas_extd2_mixed_sizes():
    """One batch spanning very different task sizes (padding tasks)."""
    rng = np.random.default_rng(60)
    tasks = global_tasks(rng, n_tasks=2, lo=20, hi=40)
    tasks += global_tasks(rng, n_tasks=2, lo=150, hi=250)
    check(tasks, 4, 2, 24, 1, 151, 400, -1, 0)


def test_pallas_extd2_windowed_long():
    """Long banded fills where the band-window path engages (W < Tpad —
    the kernel computes a moving 128-aligned window per row instead of
    the full target width; ops/ksw2_pallas.py round-3 rewrite). Sizes
    chosen so the window jumps several times and finally clamps at
    Tpad - W, covering: approx-max walk gathers inside the window,
    stale-cell persistence outside it, and the query shift-register's
    left-edge insertion across jumps."""
    rng = np.random.default_rng(70)
    t8 = rng.integers(0, 4, 900).astype(np.uint8)
    q8 = mutate(t8, rng, sub=0.08, ind=0.04)
    # asymmetric: st0 driven by the r-qlen+1 term far above the global
    # window base for late rows
    t2 = rng.integers(0, 4, 1150).astype(np.uint8)
    q2 = mutate(t2[:320], rng)
    tasks = [(q8, t8), (q2, t2)]
    # w=201 -> W=384; Tpad=1024/1280 -> windowed with multiple jumps
    check(tasks, 4, 2, 24, 1, 201, 400, -1, 0)
    check(tasks, 4, 2, 24, 1, 201, 200, -1,
          K.KSW_EZ_APPROX_MAX | K.KSW_EZ_APPROX_DROP)


def test_pallas_extd2_windowed_right_extonly():
    """Windowed path x right-aligned gaps x extension-only backtrack."""
    rng = np.random.default_rng(71)
    t8 = rng.integers(0, 4, 1000).astype(np.uint8)
    q8 = mutate(t8[:780], rng, sub=0.08, ind=0.04)
    check([(q8, t8)], 4, 2, 24, 1, 151, 400, 10,
          K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR)


@pytest.mark.parametrize("flag", [0, K.KSW_EZ_EXTZ_ONLY,
                                  K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_REV_CIGAR,
                                  K.KSW_EZ_APPROX_MAX])
def test_extz2_equals_extd2_equal_costs(flag):
    """extz2(q,e) is cell-identical to extd2(q,e,q,e) — the identity the
    tpu align backend relies on to serve the single-affine preset path
    with the one device kernel."""
    rng = np.random.default_rng(11)
    for _ in range(3):
        t8 = rng.integers(0, 4, int(rng.integers(60, 300))).astype(np.uint8)
        q8 = mutate(t8, rng)
        eb = 10 if flag & K.KSW_EZ_EXTZ_ONLY else -1
        e1 = K.ksw_extz2(len(q8), q8, len(t8), t8, MAT, 4, 2, 151, 400,
                         eb, flag)
        e2 = K.ksw_extd2(len(q8), q8, len(t8), t8, MAT, 4, 2, 4, 2, 151,
                         400, eb, flag)
        for f in FIELDS:
            assert getattr(e1, f) == getattr(e2, f), f


# ---------------------------------------------------------------------------
# exts2 (splice) kernel


def splice_tasks(rng, n_tasks=3, exon=60, intron=120):
    """Queries = concatenated exons; targets = exons separated by a
    GT..AG intron, so the splice state actually fires."""
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2  # noqa: F401
    tasks = []
    for _ in range(n_tasks):
        e1 = rng.integers(0, 4, exon).astype(np.uint8)
        e2 = rng.integers(0, 4, exon).astype(np.uint8)
        intr = rng.integers(0, 4, intron).astype(np.uint8)
        intr[0], intr[1] = 2, 3          # GT donor
        intr[-2], intr[-1] = 0, 2        # AG acceptor
        t8 = np.concatenate([e1, intr, e2])
        q8 = mutate(np.concatenate([e1, e2]), rng, sub=0.05, ind=0.02)
        tasks.append((q8, t8))
    return tasks


def check_exts2(tasks, q, e, q2, noncan, zdrop, junc_bonus, flag,
                juncs=None):
    from mm2tpu.ops.ksw2_pallas import exts2_batch
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
    res = exts2_batch(tasks, MAT, q=q, e=e, q2=q2, noncan=noncan,
                      zdrop=zdrop, junc_bonus=junc_bonus, flag=flag,
                      juncs=juncs, interpret=True)
    for i, (q8, t8) in enumerate(tasks):
        exp = ksw_exts2(len(q8), q8, len(t8), t8, MAT, q, e, q2, noncan,
                        zdrop, junc_bonus, flag,
                        junc=juncs[i] if juncs is not None else None)
        for f in FIELDS:
            assert getattr(exp, f) == getattr(res[i], f), (i, f)


@pytest.mark.parametrize("seed", range(2))
def test_pallas_exts2_splice_for(seed):
    rng = np.random.default_rng(seed)
    check_exts2(splice_tasks(rng), 4, 2, 32, 9, 200, 9,
                K.KSW_EZ_SPLICE_FOR)


def test_pallas_exts2_splice_rev_and_flank():
    rng = np.random.default_rng(5)
    check_exts2(splice_tasks(rng), 4, 2, 32, 9, 200, 9,
                K.KSW_EZ_SPLICE_REV | K.KSW_EZ_SPLICE_FLANK)


def test_pallas_exts2_rev_cigar():
    rng = np.random.default_rng(6)
    check_exts2(splice_tasks(rng), 4, 2, 32, 9, 200, 9,
                K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_REV_CIGAR |
                K.KSW_EZ_RIGHT)


def test_pallas_exts2_approx_and_junc():
    rng = np.random.default_rng(7)
    tasks = splice_tasks(rng)
    juncs = []
    for q8, t8 in tasks:
        j = np.zeros(len(t8), np.uint8)
        j[60] |= 1    # annotated donor at the intron start
        j[180] |= 2   # annotated acceptor at the intron end
        juncs.append(j)
    check_exts2(tasks, 4, 2, 32, 9, 200, 9,
                K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_APPROX_MAX |
                K.KSW_EZ_APPROX_DROP, juncs=juncs)


def test_pallas_exts2_zdrop():
    rng = np.random.default_rng(8)
    # a long mismatch tail forces a Z-drop
    t8 = rng.integers(0, 4, 300).astype(np.uint8)
    q8 = np.concatenate([t8[:80], (t8[80:] + 2) % 4]).astype(np.uint8)
    check_exts2([(q8, t8)], 4, 2, 32, 9, 50, 9, K.KSW_EZ_SPLICE_FOR)
