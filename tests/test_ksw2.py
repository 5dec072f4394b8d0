"""Differential tests: NumPy ksw2 ports vs the reference SSE kernels."""
import numpy as np
import pytest

from mm2tpu.ops import ksw2_ref as K
from tests import ksw2_oracle as O

pytestmark = pytest.mark.skipif(not O.available(), reason="ksw2 oracle not built")


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


def pair(rng, n, with_n=False):
    t = rng.integers(0, 4, n).astype(np.uint8)
    q = mutate(t, rng)
    if with_n:
        q[rng.integers(0, len(q), max(1, len(q) // 50))] = 4
    return q, t


def assert_ez(got: K.ExtzResult, exp: dict):
    assert got.zdropped == exp["zdropped"]
    assert got.max == exp["max"]
    assert got.max_q == exp["max_q"] and got.max_t == exp["max_t"]
    assert got.mqe == exp["mqe"] and got.mqe_t == exp["mqe_t"]
    assert got.mte == exp["mte"] and got.mte_q == exp["mte_q"]
    assert got.score == exp["score"]
    assert got.reach_end == exp["reach_end"]
    assert got.cigar == exp["cigar"]


MAT = K.gen_simple_mat(2, 4, 1)
MAT_ASM = K.gen_simple_mat(1, 4, 1)


@pytest.mark.parametrize("seed", range(6))
def test_extd2_global(seed):
    rng = np.random.default_rng(seed)
    q8, t8 = pair(rng, int(rng.integers(50, 600)), with_n=seed % 2)
    args = (MAT, 4, 2, 24, 1, 151, 400, -1, 0)
    exp = O.extd2(q8, t8, *args)
    got = K.ksw_extd2(len(q8), q8, len(t8), t8, *args)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(6))
def test_extd2_ext_only(seed):
    rng = np.random.default_rng(100 + seed)
    t8 = rng.integers(0, 4, int(rng.integers(80, 500))).astype(np.uint8)
    q8 = mutate(t8[: len(t8) * 2 // 3], rng)
    flag = K.KSW_EZ_EXTZ_ONLY | (K.KSW_EZ_RIGHT if seed % 2 else 0) | \
        (K.KSW_EZ_REV_CIGAR if seed % 3 == 0 else 0)
    args = (MAT, 4, 2, 24, 1, 751, 400, 10, flag)
    exp = O.extd2(q8, t8, *args)
    got = K.ksw_extd2(len(q8), q8, len(t8), t8, *args)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(4))
def test_extd2_approx_max(seed):
    rng = np.random.default_rng(200 + seed)
    q8, t8 = pair(rng, int(rng.integers(100, 400)))
    flag = K.KSW_EZ_APPROX_MAX
    args = (MAT_ASM, 6, 2, 26, 1, 751, 200, -1, flag)
    exp = O.extd2(q8, t8, *args)
    got = K.ksw_extd2(len(q8), q8, len(t8), t8, *args)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(4))
def test_extd2_zdrop_break(seed):
    """Divergent tail: zdrop must fire identically."""
    rng = np.random.default_rng(300 + seed)
    t8 = rng.integers(0, 4, 400).astype(np.uint8)
    q8 = np.concatenate([mutate(t8[:150], rng),
                         rng.integers(0, 4, 250).astype(np.uint8)])
    args = (MAT, 4, 2, 24, 1, 751, 100, -1, 0)
    exp = O.extd2(q8, t8, *args)
    got = K.ksw_extd2(len(q8), q8, len(t8), t8, *args)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(5))
def test_extz2(seed):
    rng = np.random.default_rng(400 + seed)
    q8, t8 = pair(rng, int(rng.integers(50, 400)), with_n=seed % 2)
    flag = [0, K.KSW_EZ_EXTZ_ONLY, K.KSW_EZ_RIGHT,
            K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_REV_CIGAR, K.KSW_EZ_APPROX_MAX][seed]
    args = (MAT, 4, 2, 151, 400, 10, flag)
    exp = O.extz2(q8, t8, *args)
    got = K.ksw_extz2(len(q8), q8, len(t8), t8, *args)
    assert_ez(got, exp)


def splice_pair(rng, exon=80, intron=120):
    """cDNA query vs genomic target with a canonical GT..AG intron."""
    e1 = rng.integers(0, 4, exon).astype(np.uint8)
    e2 = rng.integers(0, 4, exon).astype(np.uint8)
    mid = rng.integers(0, 4, intron - 4).astype(np.uint8)
    intr = np.concatenate([[2, 3], mid, [0, 2]]).astype(np.uint8)  # GT..AG
    t = np.concatenate([e1, intr, e2])
    q = np.concatenate([mutate(e1, rng, sub=0.05, ind=0.02),
                        mutate(e2, rng, sub=0.05, ind=0.02)])
    return q.astype(np.uint8), t


SPLICE_ARGS = (K.gen_simple_mat(1, 2, 1), 2, 1, 32, 9, 200, 9)


@pytest.mark.parametrize("seed", range(6))
def test_exts2_intron(seed):
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
    rng = np.random.default_rng(600 + seed)
    q8, t8 = splice_pair(rng, exon=int(rng.integers(40, 120)),
                         intron=int(rng.integers(30, 300)))
    flag = K.KSW_EZ_SPLICE_FOR | [0, K.KSW_EZ_SPLICE_FLANK, K.KSW_EZ_RIGHT,
                                  K.KSW_EZ_SPLICE_REV, K.KSW_EZ_REV_CIGAR,
                                  K.KSW_EZ_APPROX_MAX][seed]
    exp = O.exts2(q8, t8, *SPLICE_ARGS, flag)
    got = ksw_exts2(len(q8), q8, len(t8), t8, *SPLICE_ARGS, flag)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(3))
def test_exts2_junc_bed(seed):
    """Per-base junction annotation flags change donor/acceptor scores."""
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
    rng = np.random.default_rng(700 + seed)
    q8, t8 = splice_pair(rng)
    junc = np.zeros(len(t8), np.uint8)
    junc[rng.integers(0, len(t8), 8)] = rng.integers(1, 16, 8)
    flag = K.KSW_EZ_SPLICE_FOR | (K.KSW_EZ_SPLICE_REV if seed % 2 else 0)
    exp = O.exts2(q8, t8, *SPLICE_ARGS, flag, junc)
    got = ksw_exts2(len(q8), q8, len(t8), t8, *SPLICE_ARGS, flag, junc)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(3))
def test_exts2_plain(seed):
    """No splice flags: intron state still active, sites unscored."""
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
    rng = np.random.default_rng(800 + seed)
    q8, t8 = pair(rng, int(rng.integers(50, 250)), with_n=seed % 2)
    exp = O.exts2(q8, t8, *SPLICE_ARGS, 0)
    got = ksw_exts2(len(q8), q8, len(t8), t8, *SPLICE_ARGS, 0)
    assert_ez(got, exp)


@pytest.mark.parametrize("seed", range(5))
def test_ll(seed):
    rng = np.random.default_rng(500 + seed)
    q8, t8 = pair(rng, int(rng.integers(20, 300)))
    exp = O.ll(q8, t8, MAT, 4, 2)
    got = K.ksw_ll(len(q8), q8, len(t8), t8, MAT, 4, 2)
    assert got == exp
