"""Multi-segment chain splitting (reference: mm_seg_gen, hit.c:373-427)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from ..options import MM_SEED_SEG_MASK, MM_SEED_SEG_SHIFT
from . import hit as hit_mod
from .hit import Region


@dataclass
class Seg:
    u: np.ndarray
    a: np.ndarray
    regs: List[Region] = field(default_factory=list)


def seg_gen(hash_: int, qlens: Sequence[int], regs0: List[Region],
            a: np.ndarray) -> List[Seg]:
    n_segs = len(qlens)
    acc = [0]
    for s in range(1, n_segs):
        acc.append(acc[s - 1] + qlens[s - 1])
    qlen_sum = acc[-1] + qlens[-1]

    n_regs0 = len(regs0)
    u = [np.array([r.score << 32 for r in regs0], dtype=np.uint64)
         for _ in range(n_segs)]
    parts: List[List[List[int]]] = [[[] for _ in range(n_regs0)] for _ in range(n_segs)]
    for i, r in enumerate(regs0):
        for j in range(r.cnt):
            sid = (int(a[r.as_ + j, 1]) & MM_SEED_SEG_MASK) >> MM_SEED_SEG_SHIFT
            u[sid][i] += np.uint64(1)
            parts[sid][i].append(r.as_ + j)
    segs = []
    for s in range(n_segs):
        keep = [(int(u[s][i]), parts[s][i]) for i in range(n_regs0)
                if int(u[s][i]) & 0xFFFFFFFF]
        rows = []
        for _, idxs in keep:
            for t in idxs:
                row = a[t].copy()
                pos = int(row[1]) & 0xFFFFFFFF
                rev = int(row[0]) >> 63
                shift = (qlen_sum - (qlens[s] + acc[s])) if rev else acc[s]
                row[1] = np.uint64((int(row[1]) - shift) & 0xFFFFFFFFFFFFFFFF)
                rows.append(row)
        sa = np.array(rows, dtype=np.uint64).reshape(-1, 2) if rows else np.zeros((0, 2), np.uint64)
        su = np.array([v for v, _ in keep], dtype=np.uint64)
        seg = Seg(u=su, a=sa)
        seg.regs = hit_mod.gen_regs(hash_, qlens[s], su, sa)
        for r in seg.regs:
            r.seg_split = True
            r.seg_id = s
        segs.append(seg)
    return segs
