"""Per-read mapping pipeline (reference: mm_map_frag, map.c:272-392)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..index.build import MMIndex
from ..options import (MapOptions, MM_F_SPLICE, MM_F_SR, MM_F_CIGAR,
                       MM_F_ALL_CHAINS, MM_F_HARD_MLEVEL,
                       MM_SEED_SEG_MASK, MM_MAX_SEG)
from ..utils.hashing import reg_hash
from ..utils import profiling
from . import hit as hit_mod
from .chain import chain_dp, chain_gaps
from .esterr import est_err
from .hit import Region
from .seed import collect_minimizers, collect_seed_hits


@dataclass
class FragResult:
    regs: List[List[Region]]          # per segment
    rep_len: int = 0
    frag_gap: int = 0
    anchors: Optional[np.ndarray] = None  # post-chain anchors (debug)


@dataclass
class _FragCtx:
    """Per-fragment state between the seeding and post-chain stages —
    lets the batched driver interleave many fragments' chaining."""
    seqs: Sequence[str]
    qlens: List[int]
    qlen_sum: int
    qname: Optional[str]
    hash_: int
    is_splice: bool
    is_sr: bool
    n_segs: int
    mv: object
    sr: object
    gap_qry: int
    gap_ref: int


def _prepare(mi: MMIndex, seqs: Sequence[str], opt: MapOptions,
             qname: Optional[str], seed_hits: bool = True):
    """Seeding stage of mm_map_frag (map.c:272-316). Returns a _FragCtx,
    or a final FragResult for degenerate inputs. With seed_hits=False
    only the minimizers are collected (ctx.sr stays None — the batched
    device-seeding path fills it from the chip)."""
    n_segs = len(seqs)
    qlens = [len(s) for s in seqs]
    qlen_sum = sum(qlens)
    if qlen_sum == 0 or n_segs <= 0 or n_segs > MM_MAX_SEG or \
            (opt.max_qlen > 0 and qlen_sum > opt.max_qlen):
        return FragResult(regs=[[] for _ in range(max(n_segs, 0))])
    hash_ = reg_hash(qname, qlen_sum, opt.seed)
    with profiling.stage("seed"):
        mv = collect_minimizers(mi, opt, seqs, qlens)
        sr = (collect_seed_hits(mi, opt, opt.mid_occ, mv, qname, qlen_sum)
              if seed_hits else None)
    gap_qry, gap_ref = chain_gaps(opt, qlen_sum)
    return _FragCtx(seqs=seqs, qlens=qlens, qlen_sum=qlen_sum, qname=qname,
                    hash_=hash_, is_splice=bool(opt.flag & MM_F_SPLICE),
                    is_sr=bool(opt.flag & MM_F_SR), n_segs=n_segs,
                    mv=mv, sr=sr, gap_qry=gap_qry, gap_ref=gap_ref)


def _chain_ctx(ctx: _FragCtx, opt: MapOptions, anchors: np.ndarray):
    with profiling.stage("chain"):
        return _chain_ctx_inner(ctx, opt, anchors)


def _chain_ctx_inner(ctx: _FragCtx, opt: MapOptions, anchors: np.ndarray):
    return chain_dp(ctx.gap_ref, ctx.gap_qry, opt.bw, opt.max_chain_skip,
                    opt.max_chain_iter, opt.min_cnt, opt.min_chain_score,
                    opt.chain_gap_scale, ctx.is_splice, ctx.n_segs,
                    anchors, backend=opt.chain_backend, preset=opt.preset)


def _needs_rechain(ctx: _FragCtx, opt: MapOptions, a: np.ndarray,
                   u: np.ndarray) -> bool:
    """Re-seed trigger: best chain misses segments (map.c:318-340)."""
    if not (opt.max_occ > opt.mid_occ and ctx.sr.rep_len > 0):
        return False
    if len(u) == 0:
        return True
    scores = (u >> np.uint64(32)).astype(np.int64)
    cnts = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
    max_i = int(np.argmax(scores))
    off = int(np.sum(cnts[:max_i]))
    segs_in = a[off: off + int(cnts[max_i]), 1] & np.uint64(MM_SEED_SEG_MASK)
    n_chained_segs = 1 + int(np.sum(segs_in[1:] != segs_in[:-1]))
    return n_chained_segs < ctx.n_segs


def _dump_anchor(tag, mi, a, i, first):
    """--print-seeds SD/CN line (map.c:298-303, 350-354)."""
    import sys as _sys

    from .hit import _i32
    x, y = int(a[i, 0]), int(a[i, 1])
    rid = (x << 1 >> 33) & 0x7FFFFFFF
    diff = 0
    if not first:
        diff = (_i32(a[i, 1]) - _i32(a[i - 1, 1])) - \
               (_i32(a[i, 0]) - _i32(a[i - 1, 0]))
    print("\t".join(map(str, tag + (
        mi.seq[rid].name, _i32(np.uint64(x)), "+-"[x >> 63],
        _i32(np.uint64(y)), (y >> 32) & 0xFF, diff))), file=_sys.stderr)


def map_frag(mi: MMIndex, seqs: Sequence[str], opt: MapOptions,
             qname: Optional[str] = None) -> FragResult:
    prep = _prepare(mi, seqs, opt, qname)
    if isinstance(prep, FragResult):
        return prep
    ctx = prep
    if opt.dbg_print_seed:
        import sys as _sys
        print("RS\t%d" % ctx.sr.rep_len, file=_sys.stderr)
        for i in range(len(ctx.sr.anchors)):
            _dump_anchor(("SD",), mi, ctx.sr.anchors, i, i == 0)
    a, u = _chain_ctx(ctx, opt, ctx.sr.anchors)
    if _needs_rechain(ctx, opt, a, u):
        ctx.sr = collect_seed_hits(mi, opt, opt.max_occ, ctx.mv, qname,
                                   ctx.qlen_sum)
        a, u = _chain_ctx(ctx, opt, ctx.sr.anchors)
    return _post_chain(mi, ctx, opt, a, u)


def _post_chain(mi: MMIndex, ctx: _FragCtx, opt: MapOptions,
                a: np.ndarray, u: np.ndarray) -> FragResult:
    """Everything after chaining (map.c:344-391)."""
    n_segs, qlens, qlen_sum = ctx.n_segs, ctx.qlens, ctx.qlen_sum
    seqs, hash_, sr, is_sr = ctx.seqs, ctx.hash_, ctx.sr, ctx.is_sr
    max_chain_gap_ref = ctx.gap_ref
    res = FragResult(regs=[[] for _ in range(n_segs)])
    res.rep_len = sr.rep_len
    res.frag_gap = max_chain_gap_ref

    from ..options import MM_F_ALL_CHAINS as _ALL
    fast = None
    if (not mi.n_alt and n_segs == 1 and not opt.dbg_print_seed and
            not (opt.flag & _ALL)):
        with profiling.stage("post"):
            fast = hit_mod.gen_regs_chain_post_fast(
                hash_, qlen_sum, u, a, opt, mi.k * 2)
    if fast is not None:
        with profiling.stage("post"):
            regs0 = hit_mod.chain_post_tail(fast, opt, qlen_sum, a)
            if not is_sr:
                est_err(mi, qlen_sum, regs0, a, sr.mini_pos)
    else:
        regs0 = hit_mod.gen_regs(hash_, qlen_sum, u, a)
        if mi.n_alt:
            hit_mod.mark_alt(mi, regs0)
            regs0 = hit_mod.hit_sort(regs0, opt.alt_drop)
        if opt.dbg_print_seed:
            for j, r in enumerate(regs0):
                for i in range(r.as_, r.as_ + r.cnt):
                    _dump_anchor(("CN", j), mi, a, i, i == r.as_)

        with profiling.stage("post"):
            regs0 = hit_mod.chain_post(regs0, opt, max_chain_gap_ref, mi,
                                       qlen_sum, n_segs, qlens, a)
            if not is_sr:
                est_err(mi, qlen_sum, regs0, a, sr.mini_pos)

    if n_segs == 1:
        regs0 = _align_regs(mi, opt, qlens[0], seqs[0], regs0, a)
        hit_mod.set_mapq(regs0, opt.min_chain_score, opt.a, sr.rep_len, is_sr)
        res.regs[0] = regs0
    else:
        from .seg import seg_gen
        segs = seg_gen(hash_, qlens, regs0, a)
        for i in range(n_segs):
            regs_i = segs[i].regs
            hit_mod.set_parent(regs_i, opt.mask_level, opt.mask_len,
                               opt.a * 2 + opt.b,
                               bool(opt.flag & MM_F_HARD_MLEVEL), opt.alt_drop)
            regs_i = _align_regs(mi, opt, qlens[i], seqs[i], regs_i, segs[i].a)
            hit_mod.set_mapq(regs_i, opt.min_chain_score, opt.a, sr.rep_len, is_sr)
            res.regs[i] = regs_i
        if n_segs == 2 and opt.pe_ori >= 0 and (opt.flag & MM_F_CIGAR):
            from .pe import pair
            pair(max_chain_gap_ref, opt.pe_bonus, opt.a * 2 + opt.b, opt.a,
                 qlens, res.regs)
    res.anchors = a
    return res


def _seed_device_eligible(opt: MapOptions, ctx: "_FragCtx") -> bool:
    from ..options import (MM_F_FOR_ONLY, MM_F_NO_DIAG, MM_F_NO_DUAL,
                           MM_F_REV_ONLY)
    return (ctx.n_segs == 1 and not ctx.is_splice and
            not (opt.flag & (MM_F_NO_DIAG | MM_F_NO_DUAL | MM_F_FOR_ONLY |
                             MM_F_REV_ONLY)) and
            0 < opt.mid_occ < 4096 and len(ctx.mv) > 0)


def _seed_device_round(mi: MMIndex, opt: MapOptions, ctxs: dict,
                       idxs: List[int], interpret: bool) -> dict:
    """Device-side seeding + chaining for eligible fragments
    (ops/seed_device.py): host sketches, the chip probes the replicated
    index, builds/sorts anchors and chains them in one dispatch per
    bucket. Fills ctx.sr and returns {i: (a, u)} backtrack results.
    Fragments whose anchor totals exceed the largest bucket fall back to
    host seeding (caller handles ctx.sr is None)."""
    import jax  # noqa: F401  (jit dispatch below)

    from ..native import lib as native_lib
    from ..ops import chain_ref
    from ..ops import seed_device as sd
    from ..parallel.batching import bucket_for
    from .seed import SeedResult

    dev = sd.prepare_index_device(mi)
    mid_occ = int(opt.mid_occ)
    PAD_QHI = np.int32(0x7FFFFFFF)  # > any real key hi: guaranteed miss
    B_CH = 32

    prep = {}
    for i in idxs:
        prep[i] = sd.split_query_minimizers(ctxs[i].mv)

    def m_bucket(m):
        for b in (512, 2048, 8192):
            if m <= b:
                return b
        return -(-m // 8192) * 8192

    # ---- phase 1: occurrence counts (per M bucket) ----
    # dispatch every probe chunk first (async), then read back: the
    # device pipelines the probes while the host builds later chunks
    cnts = {}
    groups: dict = {}
    for i in idxs:
        groups.setdefault(m_bucket(len(ctxs[i].mv)), []).append(i)
    with profiling.stage("seed.device_probe"):
        probe_jobs = []
        for M, members in sorted(groups.items()):
            for off in range(0, len(members), B_CH):
                chunk = members[off:off + B_CH]
                B = B_CH if len(members) > B_CH else \
                    max(8, -(-len(chunk) // 8) * 8)
                qhi = np.full((B, M), PAD_QHI, np.int32)
                qlo = np.zeros((B, M), np.int32)
                for r, i in enumerate(chunk):
                    h, l, _, _, _ = prep[i]
                    qhi[r, :len(h)] = h
                    qlo[r, :len(h)] = l
                probe_jobs.append((chunk, sd.probe_counts(
                    dev["khi"], dev["klo"], dev["start"], dev["cnt"],
                    qhi, qlo, interpret=interpret)))
        for chunk, c in probe_jobs:
            c = np.asarray(c)
            for r, i in enumerate(chunk):
                cnts[i] = c[r, :len(ctxs[i].mv)]

    # ---- host: rep_len / mini_pos / totals / avg (seed.py semantics) ----
    meta = {}
    outs: dict = {}
    for i in idxs:
        qhi_, qlo_, qpos, qspan, qtand = prep[i]
        c = cnts[i]
        over = c >= mid_occ
        rep_len = 0
        rep_st = rep_en = 0
        for j in np.nonzero(over)[0]:
            en = int(qpos[j] >> 1) + 1
            st = en - int(qspan[j])
            if st > rep_en:
                rep_len += rep_en - rep_st
                rep_st, rep_en = st, en
            else:
                rep_en = en
        rep_len += rep_en - rep_st
        keep = ~over
        mini_pos = (qspan[keep].astype(np.uint64) << np.uint64(32)) | \
            (qpos[keep].astype(np.int64) >> 1).astype(np.uint64)
        total = int(c[keep].sum())
        sum_span = int((qspan[keep].astype(np.int64) * c[keep]).sum())
        avg = np.float32((0.01 * float(np.float32(sum_span))) /
                         total) if total else np.float32(0.0)
        meta[i] = (rep_len, mini_pos, total, avg)
        if total == 0:
            ctxs[i].sr = SeedResult(np.zeros((0, 2), np.uint64), rep_len,
                                    mini_pos, len(ctxs[i].mv))
            outs[i] = (np.zeros((0, 2), np.uint64), np.zeros(0, np.uint64))

    # ---- phase 2: fused seed+sort+chain per (M, N) bucket ----
    iter_cap = min(1024, opt.max_chain_iter)
    groups2: dict = {}
    for i in idxs:
        rep_len, mini_pos, total, avg = meta[i]
        if total == 0:
            continue
        N = bucket_for(total)
        if N > 131072:
            ctxs[i].sr = None  # host fallback
            continue
        groups2.setdefault((m_bucket(len(ctxs[i].mv)), N,
                            ctxs[i].gap_ref, ctxs[i].gap_qry), []).append(i)
    # depth-bounded dispatch/consume pipeline: the host decodes and
    # backtracks chunk k while chunk k+1 runs on the device (the
    # reference's async-DMA + busy-arbiter overlap,
    # chain_hardware.cpp:104-189)
    from ..ops.chain_packed import unpack_prel
    plan2 = []
    for (M, N, gap_ref, gap_qry), members in sorted(groups2.items()):
        for off in range(0, len(members), B_CH):
            plan2.append(((M, N, gap_ref, gap_qry),
                          members[off:off + B_CH], len(members)))

    def dispatch2(job):
        (M, N, gap_ref, gap_qry), chunk, n_members = job
        B = B_CH if n_members > B_CH else \
            max(8, -(-len(chunk) // 8) * 8)
        qhi = np.full((B, M), PAD_QHI, np.int32)
        qlo = np.zeros((B, M), np.int32)
        qpos_a = np.zeros((B, M), np.int32)
        qspan_a = np.zeros((B, M), np.int32)
        qtand_a = np.zeros((B, M), np.int32)
        qlen_a = np.ones(B, np.int32)
        avg_a = np.zeros((B, 1), np.float32)
        for r, i in enumerate(chunk):
            h, l, qpos, qspan, qtand = prep[i]
            m = len(h)
            qhi[r, :m] = h
            qlo[r, :m] = l
            qpos_a[r, :m] = qpos
            qspan_a[r, :m] = qspan
            qtand_a[r, :m] = qtand
            qlen_a[r] = ctxs[i].qlen_sum
            avg_a[r, 0] = meta[i][3]
        with profiling.stage("seed.device_chain"):
            handles = sd.seed_chain_device(
                dev["khi"], dev["klo"], dev["start"], dev["cnt"],
                dev["poshi"], dev["poslo"], qhi, qlo, qpos_a, qspan_a,
                qtand_a, qlen_a, avg_a, N=N, mid_occ=mid_occ,
                max_dist_x=gap_ref, max_dist_y=gap_qry, bw=opt.bw,
                iter_cap=iter_cap,
                gap_scale=float(opt.chain_gap_scale),
                interpret=interpret,
                rows_per_program=2 if B % 2 == 0 else 1)
        return chunk, handles

    def consume2(item):
        chunk, handles = item
        with profiling.stage("seed.device_chain"):
            xhi_s, xlo, yhi, ylo, f, prel, total_d = \
                [np.asarray(h) for h in handles]
        with profiling.stage("chain.backtrack"):
            for r, i in enumerate(chunk):
                rep_len, mini_pos, total, _ = meta[i]
                assert int(total_d[r]) == total, (i, total_d[r], total)
                a = sd.anchors_from_device(xhi_s[r], xlo[r], yhi[r],
                                           ylo[r], total)
                ctxs[i].sr = SeedResult(a, rep_len, mini_pos,
                                        len(ctxs[i].mv))
                p = unpack_prel(prel[r], total)
                v = native_lib.v_carry(f[r, :total], p) \
                    if native_lib.available() else None
                if v is None:
                    from ..ops.chain_pallas_v2 import v_carry_host
                    v = v_carry_host(f[r:r + 1, :total], p[None])[0]
                outs[i] = chain_ref.chain_backtrack(
                    total, f[r, :total], p, v, a,
                    opt.min_cnt, opt.min_chain_score)

    from collections import deque
    inflight = deque()
    for job in plan2:
        inflight.append(dispatch2(job))
        if len(inflight) > 2:
            consume2(inflight.popleft())
    while inflight:
        consume2(inflight.popleft())
    return outs


_SHARDED_STEPS: dict = {}


def _sharded_step(mesh, key, interpret, packed8=False):
    """Cached shard_map-wrapped chaining step per parameter set (a fresh
    jit per mini-batch would recompile every time). packed8 selects the
    delta-packed 8 B/anchor wire variant."""
    from ..parallel.mesh import sharded_chain_step, sharded_chain_step8
    ck = (id(mesh), key, interpret, packed8)
    if ck not in _SHARDED_STEPS:
        mdx, mdy, bw, iter_cap, gs, is_cdna, n_segs, _N = key
        mk = sharded_chain_step8 if packed8 else sharded_chain_step
        _SHARDED_STEPS[ck] = mk(
            mesh, max_dist_x=mdx, max_dist_y=mdy, bw=bw, iter_cap=iter_cap,
            gap_scale=gs, is_cdna=is_cdna, n_segs=n_segs,
            interpret=interpret)
    return _SHARDED_STEPS[ck]


def map_frags_batched(mi: MMIndex, frag_seqs: Sequence[Sequence[str]],
                      opt: MapOptions,
                      qnames: Sequence[Optional[str]],
                      mesh=None) -> List[FragResult]:
    """Map many fragments with BATCHED device chaining: fragments are
    seeded on host, their anchor arrays grouped into fixed-shape size
    buckets (parallel/batching.py), and each bucket chained in ONE Pallas
    dispatch — amortizing kernel-launch/transfer latency across reads,
    the TPU re-expression of kt_for's read parallelism (SURVEY §2.3).

    Semantics are mm_map_frag with the bounded-lookback (device) chaining
    backend for every task — identical output to per-read mapping with
    --chain-backend tpu, including the re-seed round (map.c:318-340).

    With `mesh` set, each bucket batch is sharded over the mesh's data
    axis via shard_map (replicated kernel, split rows) — multi-chip data
    parallelism over reads (SURVEY §2.3 item 1)."""
    import jax

    from ..ops import chain_ref
    from ..ops.chain_pallas import WINDOW
    from ..ops.chain_pallas_v2 import v_carry_host
    from ..ops.chain_packed import (chain_scores_packed,
                                    chain_scores_packed8, pack_tasks8,
                                    pack_tasks16, pick_lanes, unpack_prel)
    from ..parallel.batching import bucket_for, pack_tasks

    if mesh is not None:
        # the mesh's platform governs (a virtual CPU mesh can coexist
        # with a TPU default backend, e.g. the multichip dryrun)
        interpret = mesh.devices.flat[0].platform != "tpu"
    else:
        interpret = jax.default_backend() != "tpu"
    results: List[Optional[FragResult]] = [None] * len(frag_seqs)
    ctxs: dict = {}
    pending: List[int] = []
    use_dev_seed = opt.seed_backend == "tpu"
    for i, (seqs, qname) in enumerate(zip(frag_seqs, qnames)):
        prep = _prepare(mi, seqs, opt, qname, seed_hits=not use_dev_seed)
        if isinstance(prep, FragResult):
            results[i] = prep
        else:
            ctxs[i] = prep
            pending.append(i)

    def run_round(idxs):
        outs = {}
        groups: dict = {}
        for i in idxs:
            ctx = ctxs[i]
            n = len(ctx.sr.anchors)
            if n == 0:
                outs[i] = (np.zeros((0, 2), np.uint64),
                           np.zeros(0, np.uint64))
                continue
            iter_cap = min(WINDOW, opt.max_chain_iter)
            key = (ctx.gap_ref, ctx.gap_qry, opt.bw, iter_cap,
                   float(opt.chain_gap_scale), ctx.is_splice, ctx.n_segs,
                   bucket_for(n))
            groups.setdefault(key, []).append(i)
        # quantize the batch dimension so compiled shapes recur across
        # mini-batches (XLA compiles once per (B, N); an ad-hoc B would
        # recompile every batch)
        B_SIZES = (8, 16, 32, 64, 128)
        empty = np.zeros((0, 2), np.uint64)
        # Plan every fixed-shape chunk first, then run them through a
        # depth-bounded software pipeline: chunk k+1 is packed and
        # dispatched (JAX dispatch is async) while chunk k's results
        # are read back and backtracked on host — the reference's
        # async-DMA writes + busy-host arbiter structure
        # (chain_hardware.cpp:104-189, 54-92).
        plan = []
        for key, members in groups.items():
            for off in range(0, len(members), B_SIZES[-1]):
                plan.append((key, members[off:off + B_SIZES[-1]]))

        def dispatch(job):
            key, chunk = job
            mdx, mdy, bw, iter_cap, gs, is_cdna, n_segs, N = key
            B = next(b for b in B_SIZES if b >= len(chunk))
            if mesh is not None and B % mesh.size != 0:
                B = -(-B // mesh.size) * mesh.size
            tasks = [ctxs[i].sr.anchors for i in chunk] + \
                [empty] * (B - len(chunk))
            with profiling.stage("chain.device"):
                if mesh is not None:
                    p8m = pack_tasks8(tasks, N)
                    if p8m is not None:  # 8 B/anchor wire over the mesh
                        step8 = _sharded_step(mesh, key, interpret,
                                              packed8=True)
                        f, prel = step8(*p8m)
                        return chunk, f, prel, True
                    pb = pack_tasks(tasks, list(range(B)), N)
                    step = _sharded_step(mesh, key, interpret)
                    f, p = step(pb.hi, pb.lo, pb.qi, pb.span, pb.sid,
                                pb.n, pb.avg)
                    return chunk, f, p, False
                # wire-packed dispatch: delta-packed 8 B/anchor up when
                # the exception budget holds (ops/chain_packed.py;
                # x-sorted anchors delta-encode), else 16 B/anchor;
                # 6 B/anchor back either way; v3 kernel for uniseg shapes
                lanes = pick_lanes(B, not is_cdna and n_segs == 1)
                if profiling.enabled:
                    profiling.count("chain.launches")
                    profiling.count("chain.anchors",
                                    sum(len(t) for t in tasks))
                    profiling.count("chain.padded_anchors", B * N)
                p8 = pack_tasks8(tasks, N)
                if p8 is not None:
                    if profiling.enabled:
                        profiling.count("chain.bytes_up",
                                        sum(a.nbytes for a in p8))
                    f, prel = chain_scores_packed8(
                        *p8, max_dist_x=mdx, max_dist_y=mdy, bw=bw,
                        iter_cap=iter_cap, gap_scale=gs, is_cdna=is_cdna,
                        n_segs=n_segs, interpret=interpret, lanes=lanes)
                    return chunk, f, prel, True
                hi, lo, yhi, ylo, n_arr, avg_arr = pack_tasks16(tasks, N)
                if profiling.enabled:
                    profiling.count("chain.bytes_up", 16 * B * N +
                                    n_arr.nbytes + avg_arr.nbytes)
                f, prel = chain_scores_packed(
                    hi, lo, yhi, ylo, n_arr, avg_arr, max_dist_x=mdx,
                    max_dist_y=mdy, bw=bw, iter_cap=iter_cap,
                    gap_scale=gs, is_cdna=is_cdna, n_segs=n_segs,
                    interpret=interpret, lanes=lanes)
                return chunk, f, prel, True

        try:
            from ..native import lib as native_lib
            native_v = native_lib.available()
        except ImportError:
            native_v = False

        def consume(item):
            chunk, f, pr, packed = item
            with profiling.stage("chain.device"):
                f = np.asarray(f)
                pr = np.asarray(pr)
            if profiling.enabled:
                profiling.count("chain.bytes_down", f.nbytes + pr.nbytes)
            with profiling.stage("chain.backtrack"):
                if packed:
                    p_all = v_all = None
                else:
                    p_all = pr.astype(np.int32)
                    v_all = None if native_v else v_carry_host(f, p_all)
                for row, i in enumerate(chunk):
                    anchors = ctxs[i].sr.anchors
                    n = len(anchors)
                    p = unpack_prel(pr[row], n) if packed \
                        else p_all[row, :n]
                    if native_v:
                        v = native_lib.v_carry(f[row, :n], p)
                    elif packed:
                        v = v_carry_host(f[row:row + 1, :n], p[None])[0]
                    else:
                        v = v_all[row, :n]
                    outs[i] = chain_ref.chain_backtrack(
                        n, f[row, :n], p, v, anchors,
                        opt.min_cnt, opt.min_chain_score)

        from collections import deque
        inflight = deque()
        for job in plan:
            inflight.append(dispatch(job))
            if len(inflight) > 2:
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())
        return outs

    if use_dev_seed:
        elig = [i for i in pending if _seed_device_eligible(opt, ctxs[i])]
        outs = _seed_device_round(mi, opt, ctxs, elig, interpret)
        rest = []
        for i in pending:
            if ctxs[i].sr is None:  # ineligible or device-bucket overflow
                with profiling.stage("seed"):
                    ctxs[i].sr = collect_seed_hits(
                        mi, opt, opt.mid_occ, ctxs[i].mv, ctxs[i].qname,
                        ctxs[i].qlen_sum)
            if i not in outs:
                rest.append(i)
        outs.update(run_round(rest))
    else:
        outs = run_round(pending)
    rechain = []
    for i in pending:
        a, u = outs[i]
        if _needs_rechain(ctxs[i], opt, a, u):
            ctxs[i].sr = collect_seed_hits(mi, opt, opt.max_occ,
                                           ctxs[i].mv, ctxs[i].qname,
                                           ctxs[i].qlen_sum)
            rechain.append(i)
    if rechain:
        outs.update(run_round(rechain))
    from ..options import MM_F_CIGAR as _CIG
    if opt.align_backend == "tpu" and (opt.flag & _CIG) and len(pending) > 1:
        # cross-read batched device extension: align many reads on a
        # thread pool; their align_pair fills coalesce in an ExtBatcher
        # (see mapping/extbatch.py). Output is order-preserved by index.
        from concurrent.futures import ThreadPoolExecutor

        from .extbatch import ExtBatcher, worker_scope
        batcher = ExtBatcher(max_batch=64,
                             min_cells=opt.align_tpu_min_mat,
                             interpret=interpret)

        def post_one(i):
            with worker_scope(batcher):
                a, u = outs[i]
                return _post_chain(mi, ctxs[i], opt, a, u)

        with ThreadPoolExecutor(min(32, len(pending))) as ex:
            for i, res in zip(pending, ex.map(post_one, pending)):
                results[i] = res
    else:
        for i in pending:
            a, u = outs[i]
            results[i] = _post_chain(mi, ctxs[i], opt, a, u)
    return results


def _align_regs(mi: MMIndex, opt: MapOptions, qlen: int, seq: str,
                regs: List[Region], a: np.ndarray) -> List[Region]:
    """align_regs (map.c:260-270)."""
    if not (opt.flag & MM_F_CIGAR):
        return regs
    from .align import align_skeleton
    with profiling.stage("align"):
        regs = align_skeleton(mi, opt, qlen, seq, regs, a)
    if not (opt.flag & MM_F_ALL_CHAINS):
        hit_mod.set_parent(regs, opt.mask_level, opt.mask_len,
                           opt.a * 2 + opt.b,
                           bool(opt.flag & MM_F_HARD_MLEVEL), opt.alt_drop)
        regs = hit_mod.select_sub(regs, opt.pri_ratio, mi.k * 2, opt.best_n)
        hit_mod.set_sam_pri(regs)
    return regs
