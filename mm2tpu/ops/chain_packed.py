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


__all__ = ["chain_scores_packed", "unpack_prel", "pick_lanes",
           "pack_tasks16", "WINDOW"]
