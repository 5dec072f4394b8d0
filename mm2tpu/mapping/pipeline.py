"""Per-read mapping pipeline (reference: mm_map_frag, map.c:272-392)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..index.build import MMIndex
from ..options import (MapOptions, MM_F_SPLICE, MM_F_SR, MM_F_CIGAR,
                       MM_F_ALL_CHAINS, MM_F_HARD_MLEVEL, MM_F_HEAP_SORT,
                       MM_SEED_SEG_MASK, MM_MAX_SEG)
from ..utils.hashing import reg_hash
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


def map_frag(mi: MMIndex, seqs: Sequence[str], opt: MapOptions,
             qname: Optional[str] = None) -> FragResult:
    n_segs = len(seqs)
    qlens = [len(s) for s in seqs]
    qlen_sum = sum(qlens)
    res = FragResult(regs=[[] for _ in range(n_segs)])
    if qlen_sum == 0 or n_segs <= 0 or n_segs > MM_MAX_SEG:
        return res
    if opt.max_qlen > 0 and qlen_sum > opt.max_qlen:
        return res

    hash_ = reg_hash(qname, qlen_sum, opt.seed)
    is_splice = bool(opt.flag & MM_F_SPLICE)
    is_sr = bool(opt.flag & MM_F_SR)

    mv = collect_minimizers(mi, opt, seqs, qlens)
    sr = collect_seed_hits(mi, opt, opt.mid_occ, mv, qname, qlen_sum)

    max_chain_gap_qry, max_chain_gap_ref = chain_gaps(opt, qlen_sum)

    a, u = chain_dp(max_chain_gap_ref, max_chain_gap_qry, opt.bw,
                    opt.max_chain_skip, opt.max_chain_iter, opt.min_cnt,
                    opt.min_chain_score, opt.chain_gap_scale, is_splice,
                    n_segs, sr.anchors, backend=opt.chain_backend)

    # re-seed with a higher occurrence cutoff if the best chain misses
    # segments (map.c:318-340)
    if opt.max_occ > opt.mid_occ and sr.rep_len > 0:
        rechain = False
        if len(u) > 0:
            scores = (u >> np.uint64(32)).astype(np.int64)
            cnts = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
            max_i = int(np.argmax(scores))
            off = int(np.sum(cnts[:max_i]))
            segs_in = a[off: off + int(cnts[max_i]), 1] & np.uint64(MM_SEED_SEG_MASK)
            n_chained_segs = 1 + int(np.sum(segs_in[1:] != segs_in[:-1]))
            if n_chained_segs < n_segs:
                rechain = True
        else:
            rechain = True
        if rechain:
            sr = collect_seed_hits(mi, opt, opt.max_occ, mv, qname, qlen_sum)
            a, u = chain_dp(max_chain_gap_ref, max_chain_gap_qry, opt.bw,
                            opt.max_chain_skip, opt.max_chain_iter, opt.min_cnt,
                            opt.min_chain_score, opt.chain_gap_scale, is_splice,
                            n_segs, sr.anchors, backend=opt.chain_backend)

    res.rep_len = sr.rep_len
    res.frag_gap = max_chain_gap_ref

    regs0 = hit_mod.gen_regs(hash_, qlen_sum, u, a)
    if mi.n_alt:
        hit_mod.mark_alt(mi, regs0)
        regs0 = hit_mod.hit_sort(regs0, opt.alt_drop)

    regs0 = hit_mod.chain_post(regs0, opt, max_chain_gap_ref, mi, qlen_sum,
                               n_segs, qlens, a)
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


def _align_regs(mi: MMIndex, opt: MapOptions, qlen: int, seq: str,
                regs: List[Region], a: np.ndarray) -> List[Region]:
    """align_regs (map.c:260-270)."""
    if not (opt.flag & MM_F_CIGAR):
        return regs
    from .align import align_skeleton
    regs = align_skeleton(mi, opt, qlen, seq, regs, a)
    if not (opt.flag & MM_F_ALL_CHAINS):
        hit_mod.set_parent(regs, opt.mask_level, opt.mask_len,
                           opt.a * 2 + opt.b,
                           bool(opt.flag & MM_F_HARD_MLEVEL), opt.alt_drop)
        regs = hit_mod.select_sub(regs, opt.pri_ratio, mi.k * 2, opt.best_n)
        hit_mod.set_sam_pri(regs)
    return regs
