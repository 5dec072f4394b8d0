"""Sequence-divergence estimate from minimizer match fraction
(reference: esterr.c)."""
from __future__ import annotations

from typing import List

import numpy as np

from .hit import Region, _i32

f32 = np.float32


def _get_for_qpos(qlen: int, a_row) -> int:
    """esterr.c:7-14."""
    x = _i32(a_row[1])
    q_span = (int(a_row[1]) >> 32) & 0xFF
    if int(a_row[0]) >> 63:
        x = qlen - 1 - (x + 1 - q_span)
    return x


def est_err(mi, qlen: int, regs: List[Region], a: np.ndarray,
            mini_pos: np.ndarray) -> None:
    """mm_est_err (esterr.c:30-64): sets Region.div."""
    n = len(mini_pos)
    if n == 0:
        return
    sum_k = int(np.sum((mini_pos >> np.uint64(32)) & np.uint64(0xFF)))
    avg_k = float(f32(sum_k) / f32(n))
    mp_low = (mini_pos & np.uint64(0xFFFFFFFF)).astype(np.int64)

    for r in regs:
        r.div = -1.0
        if r.cnt == 0:
            continue
        first = a[r.as_ + r.cnt - 1] if r.rev else a[r.as_]
        x = _get_for_qpos(qlen, first)
        st = int(np.searchsorted(mp_low, x))
        if st >= n or mp_low[st] != x:
            continue  # logic inconsistency warning in the reference
        en = st
        l_ref = mi.seq[r.rid].length
        n_match = 1
        k = 1
        j = st + 1
        while j < n and k < r.cnt:
            xx = _get_for_qpos(qlen, a[r.as_ + r.cnt - 1 - k] if r.rev else a[r.as_ + k])
            if xx == int(mp_low[j]):
                k += 1
                en = j
                n_match += 1
            j += 1
        n_tot = en - st + 1
        if r.qs > avg_k and r.rs > avg_k:
            n_tot += 1
        if qlen - r.qs > avg_k and l_ref - r.re > avg_k:
            n_tot += 1
        if n_match >= n_tot:
            r.div = 0.0
        else:
            r.div = float(f32(1.0 - pow(n_match / n_tot, 1.0 / avg_k)))
