"""Transport-packed device chaining dispatch (the reference's DMA-lean
host runtime, chain_hardware.cpp:104-189, re-expressed for a
narrow-link TPU attachment).

The reference ships exactly two buffers per direction per chaining call
(a[] + num_subparts down, f[] + p[] back). The batched TPU path
originally shipped five int32 input planes (hi, lo, qi, span, sid =
20 B/anchor) and read back two int32 planes (f, p = 8 B/anchor). This
module cuts that to the wire minimum that keeps bit-parity:

* **Up: 16 B/anchor** — the anchor's natural (x, y) uint64 pair as four
  int32 planes (hi, lo, yhi, ylo). qi/span/sid are derived from y ON
  DEVICE in the same jit (fused element-wise ops, free next to the DP),
  exactly the field extraction of pack_anchors (chain_pallas.py:197).
* **Down: 6 B/anchor** — f stays int32 (chain scores exceed int16 on
  long reads), but p comes back as a **relative int16**: the kernels'
  bounded 1024-anchor lookback (device/minimap2_opencl.cl:5-6
  semantics) guarantees p ∈ {-1} ∪ [i-1024, i), so (i - p) fits 11
  bits. 0 encodes "no predecessor".

The epilogue/prologue run under the same jit as the Pallas kernel, so
XLA fuses them with the transfers; nothing here changes kernel math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .chain_pallas import WINDOW


def _derive_qss(yhi, ylo):
    """qi/span/sid from the split y word (pack_anchors semantics)."""
    qi = ylo
    span = yhi & 0xFF
    sid = (yhi >> 16) & 0xFF
    return qi, span, sid


def _p_rel(p):
    """Relative-predecessor compression: int32 absolute -> int16 rel."""
    i = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    return jnp.where(p >= 0, i - p, 0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=(
    "max_dist_x", "max_dist_y", "bw", "iter_cap", "gap_scale",
    "is_cdna", "n_segs", "interpret", "lanes"))
def chain_scores_packed(hi, lo, yhi, ylo, n, avg, *, max_dist_x: int,
                        max_dist_y: int, bw: int, iter_cap: int,
                        gap_scale: float, is_cdna: bool, n_segs: int,
                        interpret: bool = False, lanes: int = 1):
    """Batched chaining with wire-packed I/O. Inputs (B, N) int32 planes
    of the raw anchor words; returns (f int32, prel int16), both (B, N).
    Dispatches the v3 cross-task-lane kernel for the uniseg non-cDNA
    shape (B % 8 == 0), else v2. `lanes` = groups_per_program for v3 /
    rows_per_program for v2 (pick on host from B)."""
    B, _ = hi.shape
    qi, span, sid = _derive_qss(yhi, ylo)
    if not is_cdna and n_segs == 1 and B % 8 == 0:
        from .chain_pallas_v3 import chain_scores_device_v3
        f, p = chain_scores_device_v3(
            hi, lo, qi, span, n, avg, max_dist_x=max_dist_x,
            max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
            gap_scale=gap_scale, interpret=interpret,
            groups_per_program=lanes)
    else:
        from .chain_pallas_v2 import chain_scores_device_v2
        f, p = chain_scores_device_v2(
            hi, lo, qi, span, sid, n, avg, max_dist_x=max_dist_x,
            max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
            gap_scale=gap_scale, is_cdna=is_cdna, n_segs=n_segs,
            interpret=interpret, rows_per_program=lanes)
    return f, _p_rel(p)


# exception-slot ladder (hi changes + big lo jumps per task row):
# repeat-rich reads hit many loci, so their x streams carry hundreds of
# >64 KiB jumps; the second tier keeps them on the 8 B wire (the side
# channel is still <=19% of the planes at N=4096). Beyond that, fall
# back to the 16 B path. Fixed tiers bound the jit shape count at two.
E_LADDER = (128, 512)


def pack_tasks8(tasks, N: int):
    """Delta-packed 8 B/anchor up-plane (VERDICT r4 item 4): anchors are
    x-sorted, so the top word hi (strand|rid) is non-decreasing under a
    sign-bias and the low word delta-encodes to uint16 almost everywhere.

    Per-anchor wire: d uint16 (lo delta) + qi int32 + spansid uint16
    = 8 B, plus an (B, E) exception side-channel carrying absolute
    (pos, lo-correction, biased-hi) triples wherever the delta overflows
    or hi changes; E is the smallest E_LADDER tier that fits the whole
    batch (fixed tiers keep the jit shape count at two). Decode on
    device is one cumsum + one cummax fused into the kernel's jit
    (_decode8).

    Returns None if any row needs more than max(E_LADDER) exceptions —
    the caller falls back to pack_tasks16 (same results, wider wire)."""
    from .chain_ref import avg_qspan_scaled
    B = len(tasks)
    SENT_HI = -0x7FFFFF0  # never-matching pad sentinel (pack_anchors:202)
    BIAS = np.uint32(0x80000000)
    d = np.zeros((B, N), np.uint16)
    qi = np.zeros((B, N), np.int32)
    spansid = np.zeros((B, N), np.uint16)
    n_arr = np.zeros((B, 1), np.int32)
    avg_arr = np.zeros((B, 1), np.float32)
    sent_hib = int((np.array(SENT_HI, np.int32).view(np.uint32) ^ BIAS)
                   .view(np.int32))
    per_row = []  # (idx, c, hib, m, last_lo) for the fill pass
    k_max = 0
    for b, a in enumerate(tasks):
        m = len(a)
        n_arr[b, 0] = m
        if m:
            avg_arr[b, 0] = avg_qspan_scaled(a)
        x = a[:, 0] if m else np.zeros(0, np.uint64)
        y = a[:, 1] if m else np.zeros(0, np.uint64)
        hi_u = (x >> np.uint64(32)).astype(np.uint32)
        lo_i = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        hib = (hi_u ^ BIAS).view(np.int32)
        yhi = (y >> np.uint64(32)).astype(np.uint32).view(np.int32)
        qi[b, :m] = (y & np.uint64(0xFFFFFFFF)).astype(np.uint32) \
            .view(np.int32)
        spansid[b, :m] = ((yhi & 0xFF) | (((yhi >> 16) & 0xFF) << 8)) \
            .astype(np.uint16)
        # exception positions: first anchor, hi changes, lo-delta
        # overflow/negative, and the first pad cell (restores the
        # sentinel hi and zero lo of the padded region)
        c = np.zeros(m, np.int64)
        if m:
            c[0] = int(lo_i[0])
            c[1:] = lo_i[1:].astype(np.int64) - lo_i[:-1].astype(np.int64)
        need = np.zeros(m, bool)
        if m:
            need[0] = True
            need[1:] |= hib[1:] != hib[:-1]
            need |= (c < 0) | (c > 0xFFFF)
        idx = np.flatnonzero(need)
        k = len(idx) + (1 if m < N else 0)
        if k > E_LADDER[-1]:
            return None
        k_max = max(k_max, k)
        fit = ~need
        d[b, :m][fit] = c[fit].astype(np.uint16)
        per_row.append((idx, c, hib, m,
                        int(lo_i[m - 1]) if m else 0))
    E = next(e for e in E_LADDER if e >= k_max)
    exc_pos = np.full((B, E), N, np.int32)   # N = out-of-bounds: drop
    exc_c = np.zeros((B, E), np.int32)
    exc_hib = np.zeros((B, E), np.int32)
    for b, (idx, c, hib, m, last_lo) in enumerate(per_row):
        exc_pos[b, :len(idx)] = idx
        exc_c[b, :len(idx)] = c[idx].astype(np.int32)
        exc_hib[b, :len(idx)] = hib[idx]
        if m < N:  # pad region: sentinel hi, lo back to 0
            exc_pos[b, len(idx)] = m
            exc_c[b, len(idx)] = -last_lo
            exc_hib[b, len(idx)] = sent_hib
    return (d, qi, spansid, exc_pos, exc_c, exc_hib, n_arr, avg_arr)


def _decode8(d, qi, spansid, exc_pos, exc_c, exc_hib):
    """Device-side inverse of pack_tasks8 (runs fused inside the same
    jit as the chaining kernel): lo = cumsum(deltas + scattered
    corrections), hi = cummax(scattered biased-hi) ^ bias."""
    B, N = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, exc_pos.shape, 0)
    # exception positions carry d == 0 on the wire, so a scatter-add of
    # the absolute correction lands the true delta there
    c = d.astype(jnp.int32).at[rows, exc_pos].add(exc_c, mode="drop")
    lo = jnp.cumsum(c, axis=1, dtype=jnp.int32)
    hib = jnp.full((B, N), jnp.int32(-0x80000000))
    hib = hib.at[rows, exc_pos].max(exc_hib, mode="drop")
    hib = jax.lax.cummax(hib, axis=1)
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(hib, jnp.uint32)
        ^ jnp.uint32(0x80000000), jnp.int32)
    span = (spansid & 0xFF).astype(jnp.int32)
    sid = (spansid >> 8).astype(jnp.int32)
    return hi, lo, qi, span, sid


@functools.partial(jax.jit, static_argnames=(
    "max_dist_x", "max_dist_y", "bw", "iter_cap", "gap_scale",
    "is_cdna", "n_segs", "interpret", "lanes"))
def chain_scores_packed8(d, qi, spansid, exc_pos, exc_c, exc_hib, n, avg,
                         *, max_dist_x: int, max_dist_y: int, bw: int,
                         iter_cap: int, gap_scale: float, is_cdna: bool,
                         n_segs: int, interpret: bool = False,
                         lanes: int = 1):
    """chain_scores_packed with the delta-packed 8 B/anchor up-plane."""
    B, _ = d.shape
    hi, lo, qi, span, sid = _decode8(d, qi, spansid, exc_pos, exc_c,
                                     exc_hib)
    if not is_cdna and n_segs == 1 and B % 8 == 0:
        from .chain_pallas_v3 import chain_scores_device_v3
        f, p = chain_scores_device_v3(
            hi, lo, qi, span, n, avg, max_dist_x=max_dist_x,
            max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
            gap_scale=gap_scale, interpret=interpret,
            groups_per_program=lanes)
    else:
        from .chain_pallas_v2 import chain_scores_device_v2
        f, p = chain_scores_device_v2(
            hi, lo, qi, span, sid, n, avg, max_dist_x=max_dist_x,
            max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
            gap_scale=gap_scale, is_cdna=is_cdna, n_segs=n_segs,
            interpret=interpret, rows_per_program=lanes)
    return f, _p_rel(p)


def unpack_prel(prel_row: np.ndarray, n: int) -> np.ndarray:
    """Host-side inverse of _p_rel for one row truncated to n."""
    rel = np.asarray(prel_row[:n], dtype=np.int32)
    i = np.arange(n, dtype=np.int32)
    return np.where(rel > 0, i - rel, -1)


def pick_lanes(B: int, uniseg: bool) -> int:
    """Max interleave the batch shape supports (v3 groups / v2 rows)."""
    if uniseg and B % 8 == 0:
        return next(g for g in (4, 2, 1) if B % (8 * g) == 0)
    return next(r for r in (4, 2, 1) if B % r == 0)


def pack_tasks16(tasks, N: int):
    """Pack anchor arrays into the four 16 B/anchor wire planes +
    (n, avg) scalars. Padding rows carry the never-matching hi sentinel
    (pack_anchors:202)."""
    from .chain_ref import avg_qspan_scaled
    B = len(tasks)
    hi = np.full((B, N), -0x7FFFFF0, np.int32)
    lo = np.zeros((B, N), np.int32)
    yhi = np.zeros((B, N), np.int32)
    ylo = np.zeros((B, N), np.int32)
    n_arr = np.zeros((B, 1), np.int32)
    avg_arr = np.zeros((B, 1), np.float32)
    for b, a in enumerate(tasks):
        m = len(a)
        if m == 0:
            continue
        x = a[:, 0]
        y = a[:, 1]
        hi[b, :m] = (x >> np.uint64(32)).astype(np.uint32).view(np.int32)
        lo[b, :m] = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32) \
            .view(np.int32)
        yhi[b, :m] = (y >> np.uint64(32)).astype(np.uint32).view(np.int32)
        ylo[b, :m] = (y & np.uint64(0xFFFFFFFF)).astype(np.uint32) \
            .view(np.int32)
        n_arr[b, 0] = m
        avg_arr[b, 0] = avg_qspan_scaled(a)
    return hi, lo, yhi, ylo, n_arr, avg_arr


__all__ = ["chain_scores_packed", "chain_scores_packed8", "unpack_prel",
           "pick_lanes", "pack_tasks16", "pack_tasks8", "E_LADDER", "WINDOW"]
