"""Shared constants + anchor packing for the Pallas chaining kernels.

Semantics contract (all kernel generations): bounded-lookback chaining
DP — for anchor i, score predecessors j in [max(0, i-1024), i) subject
to the reference's distance/band gates, pick the max (ties -> largest
j), no max_skip heuristic. This is exactly the reference fork's
hardware contract (device/minimap2_opencl.cl:5-6 with chain.c:195
VERIFY semantics); the oracle is ops/chain_ref.chain_scores_window.

x is split into hi = x>>32 (strand|rid) and lo = (int32)x (ref pos):
the window-start rule `a[i].x > a[st].x + max_dist_x` (chain.c:121) is
equivalent to hi_j == hi_i && lo_i - lo_j <= max_dist_x because a
strand/rid change makes the 64-bit difference exceed any max_dist_x.

The kernel generations live in chain_pallas_v2.py (R-row interleave;
production for multiseg/cDNA) and chain_pallas_v3.py (cross-task lanes
+ G-group interleave; production for the uniseg batch/device-seed
paths). The round-1 v1 kernel body that used to live here was
superseded by both and removed.
"""
from __future__ import annotations

import numpy as np

from ..options import MM_SEED_SEG_MASK, MM_SEED_SEG_SHIFT

WINDOW = 1024
TILE = 128
NEG = -0x40000000


def pack_anchors(a: np.ndarray, N: int | None = None):
    """Split packed (n,2) uint64 anchors into kernel inputs, padded to N."""
    n = len(a)
    if N is None:
        N = max(WINDOW, -(-n // WINDOW) * WINDOW)
    hi = np.full(N, -0x7FFFFFF0, np.int32)  # never matches a real strand|rid
    lo = np.zeros(N, np.int32)
    qi = np.zeros(N, np.int32)
    span = np.zeros(N, np.int32)
    sid = np.zeros(N, np.int32)
    x = a[:, 0]
    y = a[:, 1]
    hi[:n] = (x >> np.uint64(32)).astype(np.uint32).view(np.int32)
    lo[:n] = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    qi[:n] = (y & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    span[:n] = ((y >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    sid[:n] = ((y & np.uint64(MM_SEED_SEG_MASK)) >> np.uint64(MM_SEED_SEG_SHIFT)).astype(np.int32)
    return hi, lo, qi, span, sid
