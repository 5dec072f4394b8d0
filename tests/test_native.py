"""Differential tests: native C++ runtime vs the Python references."""
import subprocess
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    so = REPO / "native" / "libmm2tpu.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(REPO / "native")], check=True)
    from mm2tpu.native import lib as nl
    assert nl.available()
    return nl


def test_native_chain_exact(native):
    from tests.test_chain_pallas import synth_anchors
    from mm2tpu.ops.chain_ref import chain_scores_exact
    for seed in (1, 2, 3):
        a = synth_anchors(n=1500, seed=seed, n_rids=2, rev_frac=0.3, scale=4)
        args = (5000, 5000, 500, 25, 5000, 1.0, False, 1)
        f1, p1, v1 = chain_scores_exact(a, *args)
        f2, p2, v2 = native.chain_scores_exact(a, *args)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(v1, v2)


def test_native_chain_cdna(native):
    from tests.test_chain_pallas import synth_anchors
    from mm2tpu.ops.chain_ref import chain_scores_exact
    a = synth_anchors(n=800, seed=9)
    args = (200000, 2000, 200000, 25, 5000, 1.0, True, 1)
    f1, p1, v1 = chain_scores_exact(a, *args)
    f2, p2, v2 = native.chain_scores_exact(a, *args)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(p1, p2)


def test_native_sketch(native, ref_test_dir):
    from mm2tpu.index.sketch import sketch, encode_nt4
    from mm2tpu.io.bseq import read_fastx
    q = next(read_fastx(str(ref_test_dir / "MT-human.fa")))
    codes = encode_nt4(q.seq)
    for w, k, hpc in ((10, 15, False), (10, 19, True), (5, 15, False), (19, 19, False)):
        py = np.array(sketch(codes, w, k, 3, hpc), dtype=np.uint64).reshape(-1, 2)
        nat = native.sketch(codes, w, k, 3, hpc)
        np.testing.assert_array_equal(py, nat)


def test_native_sketch_ambiguous(native):
    from mm2tpu.index.sketch import sketch, encode_nt4
    seq = "ACGTNNACGTACGTGGGGGGTTTACGNATC" * 20
    codes = encode_nt4(seq)
    py = np.array(sketch(codes, 5, 7, 0, True), dtype=np.uint64).reshape(-1, 2)
    nat = native.sketch(codes, 5, 7, 0, True)
    np.testing.assert_array_equal(py, nat)


def test_native_v_carry(native):
    rng = np.random.default_rng(0)
    n = 1000
    f = rng.integers(0, 100, n).astype(np.int32)
    p = np.minimum(np.arange(n) - rng.integers(1, 50, n), 10**9).astype(np.int32)
    p = np.where(p < 0, -1, p)
    v1 = np.zeros(n, np.int32)
    for i in range(n):
        v1[i] = v1[p[i]] if (p[i] >= 0 and v1[p[i]] > f[i]) else f[i]
    v2 = native.v_carry(f, p)
    np.testing.assert_array_equal(v1, v2)


def test_e2e_with_native_backend(golden_dir, ref_test_dir, native):
    from tests.test_e2e_paf import run_cli
    out = run_cli(f"--chain-backend native -x map-ont "
                  f"/root/reference/test/MT-orang.fa /root/reference/test/MT-human.fa")
    assert out == (golden_dir / "mapont_MT.paf").read_text()


@pytest.mark.parametrize("flag_name", ["plain", "extz_only", "rev_right",
                                       "approx", "score_only"])
def test_native_ksw_extd2_matches_oracle(flag_name):
    """Native C++ extd2 vs the NumPy oracle across flags, gap models and
    N bases (the oracle itself is pinned to the SSE build in
    test_ksw2.py)."""
    from mm2tpu.ops import ksw2_ref as K
    from mm2tpu.native import lib as native_lib
    if not native_lib.has_ksw():
        pytest.skip("native library not built")
    flags = dict(plain=0, extz_only=K.KSW_EZ_EXTZ_ONLY,
                 rev_right=K.KSW_EZ_REV_CIGAR | K.KSW_EZ_RIGHT,
                 approx=K.KSW_EZ_APPROX_MAX | K.KSW_EZ_APPROX_DROP,
                 score_only=K.KSW_EZ_SCORE_ONLY)[flag_name]
    mat = K.gen_simple_mat(2, 4, 1)
    rng = np.random.default_rng(hash(flag_name) & 0xFFFF)
    fields = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
              "mte_q", "score", "reach_end", "cigar")
    for _ in range(4):
        t8 = rng.integers(0, 5, int(rng.integers(40, 400))).astype(np.uint8)
        q8 = []
        for c in t8:
            r = rng.random()
            if r < 0.03:
                continue
            if r < 0.12:
                q8.append(int(rng.integers(0, 4)))
            q8.append(int(c))
        q8 = np.array(q8, np.uint8)
        eb = 10 if flags & K.KSW_EZ_EXTZ_ONLY else -1
        for q, e, q2, e2 in ((4, 2, 24, 1), (4, 2, 4, 2)):
            exp = K.ksw_extd2(len(q8), q8, len(t8), t8, mat, q, e, q2, e2,
                              151, 400, eb, flags)
            got = native_lib.ksw_extd2(len(q8), q8, len(t8), t8, mat, q, e,
                                       q2, e2, 151, 400, eb, flags)
            for f in fields:
                assert getattr(exp, f) == getattr(got, f), (flag_name, f)


@pytest.mark.parametrize("mode", ["fwd", "rev", "both", "flank", "junc",
                                  "rev_cigar", "approx", "score_only"])
def test_native_ksw_exts2_matches_oracle(mode):
    """Native C++ exts2 (splice) vs the NumPy oracle across strand flags,
    flank scoring, junction bonuses and approx/score-only modes (the
    oracle is pinned to the SSE build in test_ksw2.py)."""
    from mm2tpu.ops import ksw2_ref as K
    from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
    from mm2tpu.native import lib as native_lib
    if not native_lib.has_exts2():
        pytest.skip("native library not built")
    flags = dict(
        fwd=K.KSW_EZ_SPLICE_FOR,
        rev=K.KSW_EZ_SPLICE_REV,
        both=K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SPLICE_REV,
        flank=K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SPLICE_FLANK,
        junc=K.KSW_EZ_SPLICE_FOR,
        rev_cigar=K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_REV_CIGAR | K.KSW_EZ_RIGHT,
        approx=K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_APPROX_MAX
               | K.KSW_EZ_APPROX_DROP,
        score_only=K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SCORE_ONLY,
    )[mode]
    mat = K.gen_simple_mat(1, 2, 1)
    rng = np.random.default_rng(hash(mode) & 0xFFFF)
    fields = ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
              "mte_q", "score", "reach_end", "cigar")
    for rep in range(3):
        # exon/intron structured target so introns + canonical sites occur
        tlen = int(rng.integers(200, 900))
        t8 = rng.integers(0, 4, tlen).astype(np.uint8)
        # drop in GT..AG motifs
        for _ in range(6):
            i = int(rng.integers(0, tlen - 40))
            ln = int(rng.integers(25, 40))
            t8[i], t8[i + 1] = 2, 3
            t8[i + ln - 2], t8[i + ln - 1] = 0, 2
        # query = target with the motif spans deleted + noise
        q8 = []
        skip = 0
        for i, c in enumerate(t8):
            if skip:
                skip -= 1
                continue
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.08:
                q8.append(int(rng.integers(0, 4)))
            q8.append(int(c))
        q8 = np.array(q8, np.uint8)
        junc = None
        if mode == "junc":
            junc = rng.integers(0, 16, tlen).astype(np.uint8)
        for q, e, q2, noncan in ((6, 2, 32, 9), (4, 1, 26, 5)):
            exp = ksw_exts2(len(q8), q8, tlen, t8, mat, q, e, q2, noncan,
                            200, 9, flags, junc)
            got = native_lib.ksw_exts2(len(q8), q8, tlen, t8, mat, q, e,
                                       q2, noncan, 200, 9, flags, junc)
            for f in fields:
                assert getattr(exp, f) == getattr(got, f), (mode, f)


def test_native_ksw_ll_matches_oracle():
    """Native striped local SW vs the NumPy oracle (score/qe/te incl. the
    striped-memory tie scan), on random and inversion-like inputs."""
    from mm2tpu.ops import ksw2_ref as K
    from mm2tpu.native import lib as native_lib
    if not native_lib.has_ksw_ll():
        pytest.skip("native library not built")
    mat = K.gen_simple_mat(2, 4, 1)
    rng = np.random.default_rng(99)
    for rep in range(12):
        tlen = int(rng.integers(5, 300))
        t8 = rng.integers(0, 5, tlen).astype(np.uint8)
        if rep % 3 == 0:  # inversion-like: query ~ revcomp of target
            sub = t8[::-1]
            q8 = np.where(sub >= 4, 4, 3 - sub).astype(np.uint8)
        else:
            q8 = rng.integers(0, 5, int(rng.integers(5, 300))).astype(np.uint8)
        for gapo, gape in ((4, 2), (6, 1)):
            exp = K.ksw_ll(len(q8), q8, tlen, t8, mat, gapo, gape)
            got = native_lib.ksw_ll(len(q8), q8, tlen, t8, mat, gapo, gape)
            assert exp == got, (rep, gapo, gape, exp, got)


def test_native_sdust_matches_python():
    """Native SDUST vs the Python port on random sequences with injected
    low-complexity repeats and N breaks, across thresholds."""
    from mm2tpu.mapping.sdust import sdust_core
    from mm2tpu.native import lib as native_lib
    if not native_lib.has_sdust():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    for rep in range(20):
        n = int(rng.integers(10, 3000))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, n))
            ln = int(rng.integers(5, 60))
            codes[p:p + ln] = np.resize([0, 3], min(ln, n - p))
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, n))
            codes[p:p + int(rng.integers(1, 5))] = 4
        for T in (20, 15, 30):
            assert sdust_core(codes, T, 64) == \
                native_lib.sdust(codes, T, 64), (rep, T)


def test_native_est_err_matches_python(native):
    """mm2_est_err vs the NumPy reference (esterr.py): randomized
    minimizer ladders, rev/fwd regions, unmatched anchors, boundary
    n_tot bumps (esterr.c:30-64)."""
    import numpy as np
    from mm2tpu.mapping import esterr
    from mm2tpu.mapping.hit import Region

    class _Seq:
        def __init__(self, length):
            self.length = length

    class _MI:
        def __init__(self, lens):
            self.seq = [_Seq(l) for l in lens]

    rng = np.random.default_rng(7)
    for trial in range(40):
        qlen = int(rng.integers(200, 8000))
        n_mini = int(rng.integers(1, 160))
        k = int(rng.integers(10, 28))
        qpos = np.sort(rng.choice(np.arange(k, qlen, dtype=np.uint64),
                                  size=min(n_mini, max(1, qlen - k)),
                                  replace=False))
        if rng.random() < 0.3 and len(qpos) > 2:
            # duplicated positions: pins the LEFTMOST-match search and
            # the _match_loop fallback against the native path
            dup = int(rng.integers(1, len(qpos)))
            qpos = np.sort(np.concatenate([qpos, qpos[dup:dup + 1]]))
        n_mini = len(qpos)
        spans = rng.integers(10, 28, n_mini).astype(np.uint64)
        mini_pos = (spans << np.uint64(32)) | qpos
        regs, rows = [], []
        n_regs = int(rng.integers(1, 5))
        for ri in range(n_regs):
            cnt = int(rng.integers(1, min(12, n_mini + 1)))
            rev = bool(rng.integers(0, 2))
            # anchors whose forward qpos values are a subset of the ladder
            # (sometimes corrupted so the two-pointer scan stalls)
            sel = np.sort(rng.choice(n_mini, size=cnt, replace=False))
            xs = qpos[sel].astype(np.int64)
            if rng.random() < 0.3 and cnt > 1:
                xs[int(rng.integers(1, cnt))] += 1  # unmatched anchor
            as_ = len(rows)
            for x in (xs[::-1] if rev else xs):
                span = int(spans[0])
                if rev:
                    y_low = qlen - 1 - int(x) + span - 1
                    ax = (np.uint64(1) << np.uint64(63))
                else:
                    y_low = int(x)
                    ax = np.uint64(0)
                ay = (np.uint64(span) << np.uint64(32)) | np.uint64(
                    y_low & 0xFFFFFFFF)
                rows.append((ax, ay))
            r = Region(cnt=cnt, rev=rev, as_=as_, rid=0,
                       qs=int(rng.integers(0, qlen // 2)),
                       qe=qlen, rs=int(rng.integers(0, 1000)),
                       re=int(rng.integers(1000, 5000)))
            regs.append(r)
        a = np.array(rows, np.uint64).reshape(-1, 2)
        mi = _MI([6000])
        regs2 = [Region(**{f: getattr(r, f) for f in
                           ("cnt", "rev", "as_", "rid", "qs", "qe",
                            "rs", "re")}) for r in regs]
        esterr.est_err_py(mi, qlen, regs, a, mini_pos)
        nr = len(regs2)
        div = native.est_err_div(
            qlen,
            np.fromiter((r.as_ for r in regs2), np.int64, nr),
            np.fromiter((r.cnt for r in regs2), np.int32, nr),
            np.fromiter((r.rev for r in regs2), np.uint8, nr),
            np.fromiter((r.qs for r in regs2), np.int32, nr),
            np.fromiter((r.rs for r in regs2), np.int32, nr),
            np.fromiter((r.re for r in regs2), np.int32, nr),
            np.fromiter((mi.seq[r.rid].length for r in regs2), np.int32,
                        nr),
            a, mini_pos)
        got = [float(d) for d in div]
        want = [r.div for r in regs]
        assert got == pytest.approx(want, abs=0.0), (trial, got, want)


def test_native_fix_bad_ends_matches_python(native):
    """mm2_fix_bad_ends vs the Python loops (align.c:459-493):
    randomized chains incl. LONG_JOIN seeds, jumpy ends, tiny cnt."""
    import numpy as np
    from mm2tpu.mapping.align import fix_bad_ends_py
    from mm2tpu.mapping.hit import Region
    from mm2tpu.options import MM_SEED_LONG_JOIN

    rng = np.random.default_rng(11)
    for trial in range(200):
        cnt = int(rng.integers(1, 60))
        pad = int(rng.integers(0, 5))
        n = cnt + pad + int(rng.integers(0, 4))
        x = np.cumsum(rng.integers(1, 400, n).astype(np.int64))
        q = np.cumsum(rng.integers(1, 200, n).astype(np.int64))
        span = rng.integers(10, 28, n).astype(np.uint64)
        ax = x.astype(np.uint64)
        ay = (span << np.uint64(32)) | (q.astype(np.uint64) &
                                       np.uint64(0xFFFFFFFF))
        if rng.random() < 0.25 and n > 2:
            ay[int(rng.integers(1, n))] |= np.uint64(MM_SEED_LONG_JOIN)
        a = np.stack([ax, ay], axis=1)
        r = Region(as_=pad, cnt=cnt, mlen=int(rng.integers(0, 4000)))
        bw = int(rng.integers(50, 2000))
        mm = int(rng.integers(20, 200))
        want = fix_bad_ends_py(r, a, bw, mm)
        got = (native.fix_bad_ends(a, r.as_, r.cnt, bw, mm, r.mlen)
               if r.cnt >= 3 else want)
        assert got == want, (trial, got, want)
