"""Pallas TPU anchor-chaining kernel.

Semantics: bounded-lookback chaining DP — for anchor i, score predecessors
j in [max(0, i-1024), i) subject to the reference's distance/band gates,
pick the max (ties -> largest j), no max_skip heuristic. This is exactly
the reference fork's hardware contract (device/minimap2_opencl.cl:5-6 with
chain.c:195 VERIFY semantics); the oracle is ops/chain_ref.chain_scores_window.

TPU mapping of the FPGA design (128-wide unrolled scoring x 8 subparts,
1025-deep shift register, minimap2_opencl.cl:30-148):
  - the 1024-anchor lookback window lives in VMEM as six (8,128) int32
    ring buffers (hi, lo, qi, sid, f, p) — one VPU tile each,
  - the grid is (batch, N/128): each step runs a 128-iteration fori_loop,
    one anchor per iteration, scoring all 1024 slots in a handful of
    (8,128) vector ops and max-reducing,
  - anchor fields stream through SMEM in (1,128) blocks (they are consumed
    scalar-by-scalar); f/p results are flushed with one aligned (1,128)
    VMEM vector store per tile — the completed ring row.

x is split into hi = x>>32 (strand|rid) and lo = (int32)x (ref pos): the
window-start rule `a[i].x > a[st].x + max_dist_x` (chain.c:121) is
equivalent to hi_j == hi_i && lo_i - lo_j <= max_dist_x because a
strand/rid change makes the 64-bit difference exceed any max_dist_x.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..options import MM_SEED_SEG_MASK, MM_SEED_SEG_SHIFT

WINDOW = 1024
TILE = 128
NEG = -0x40000000


def _ilog2_tile(v):
    """floor(log2(v)) for v>0 on an int32 tile; 0 -> 0 (chain.c:134 log_dd)."""
    r = jnp.zeros_like(v)
    t = v
    for shift in (16, 8, 4, 2, 1):
        big = t >= (1 << shift)
        r = jnp.where(big, r + shift, r)
        t = jnp.where(big, t >> shift, t)
    return r


def _chain_kernel(max_dist_x: int, max_dist_y: int, bw: int, iter_cap: int,
                  gap_scale: float, is_cdna: bool, n_segs: int,
                  n_ref, avg_ref, hi_ref, lo_ref, qi_ref, span_ref, sid_ref,
                  f_out, p_out, v_out, hi_s, lo_s, qi_s, sid_s, f_s, p_s, d_s, v_s):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n = n_ref[b, 0]
    avg = avg_ref[b, 0]

    @pl.when(t == 0)
    def _init():
        hi_s[:] = jnp.full((8, TILE), -0x7FFFFFFF, jnp.int32)
        lo_s[:] = jnp.zeros((8, TILE), jnp.int32)
        qi_s[:] = jnp.zeros((8, TILE), jnp.int32)
        sid_s[:] = jnp.zeros((8, TILE), jnp.int32)
        f_s[:] = jnp.zeros((8, TILE), jnp.int32)
        p_s[:] = jnp.full((8, TILE), -1, jnp.int32)
        d_s[:] = jnp.full((8, TILE), 4 * WINDOW, jnp.int32)
        v_s[:] = jnp.zeros((8, TILE), jnp.int32)

    srow = jax.lax.broadcasted_iota(jnp.int32, (8, TILE), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (8, TILE), 1)

    def body(k, _):
        i = t * WINDOW + k
        row_sel = srow == ((k // TILE) % 8)

        @pl.when(i < n)
        def _step():
            hi_i = hi_ref[k]
            lo_i = lo_ref[k]
            qi_i = qi_ref[k]
            span_i = span_ref[k]
            sid_i = sid_ref[k]

            # d_s holds the age i - j of the anchor in each slot (maintained
            # incrementally: +1 per step, reset to 1 on overwrite) — avoids
            # a per-step tile modulo, which the VPU emulates expensively.
            d = d_s[:]

            dr = lo_i - lo_s[:]
            dq = qi_i - qi_s[:]
            same = sid_s[:] == sid_i
            ok = (d <= iter_cap) & (hi_s[:] == hi_i) & (dr <= max_dist_x)
            ok &= ~((same & (dr == 0)) | (dq <= 0))
            ok &= ~((same & (dq > max_dist_y)) | (dq > max_dist_x))
            dd = jnp.abs(dr - dq)
            ok &= ~(same & (dd > bw))
            if n_segs > 1 and not is_cdna:
                ok &= ~(same & (dr > max_dist_y))

            min3 = jnp.minimum(jnp.minimum(dq, dr), span_i).astype(jnp.int32)
            log_dd = _ilog2_tile(dd)
            c_lin = (dd.astype(jnp.float32) * avg).astype(jnp.int32)
            lin_cost = c_lin + (log_dd >> 1)
            if is_cdna or n_segs > 1:
                in_branch = jnp.full_like(same, True) if is_cdna else ~same
                pair_bonus = (~same) & (dr == 0)
                min_cost = jnp.minimum(c_lin, log_dd)
                branch_cost = jnp.where(pair_bonus, 0,
                                        jnp.where((dr > dq) | ~same, min_cost, lin_cost))
                gap = jnp.where(in_branch, branch_cost, lin_cost)
                base = min3 + jnp.where(in_branch & pair_bonus, 1, 0)
            else:
                gap = lin_cost
                base = min3
            if gap_scale == 1.0:
                sc = base - gap
            else:
                sc = base - (gap.astype(jnp.float32) * jnp.float32(gap_scale)
                             + jnp.float32(0.499)).astype(jnp.int32)
            sc = sc + f_s[:]
            sc = jnp.where(ok, sc, NEG)

            m = jnp.max(sc)
            # ties: the C scan runs j descending with strict '>', so the
            # largest j (smallest d) wins
            dmin = jnp.min(jnp.where((sc == m) & ok, d, 2 * WINDOW))
            better = m > span_i
            f_i = jnp.where(better, m, span_i)
            p_i = jnp.where(better, i - dmin, -1)
            # v[] peak-score carry (chain.c:110): v_i = max(f_i, v[p_i])
            v_pj = jnp.max(jnp.where((d == dmin) & ok, v_s[:], NEG))
            v_i = jnp.where(better & (v_pj > f_i), v_pj, f_i)

            # ring update at slot i % 1024 (vector select; no scalar scatter)
            at = row_sel & (scol == (k % TILE))
            hi_s[:] = jnp.where(at, hi_i, hi_s[:])
            lo_s[:] = jnp.where(at, lo_i, lo_s[:])
            qi_s[:] = jnp.where(at, qi_i, qi_s[:])
            sid_s[:] = jnp.where(at, sid_i, sid_s[:])
            f_s[:] = jnp.where(at, f_i, f_s[:])
            p_s[:] = jnp.where(at, p_i, p_s[:])
            v_s[:] = jnp.where(at, v_i, v_s[:])
            d_s[:] = jnp.where(at, 1, d_s[:] + 1)

        return 0

    jax.lax.fori_loop(0, WINDOW, body, 0)
    # flush the full ring (8 x 128 static row stores, in slot order)
    for r in range(8):
        f_out[pl.ds(r * TILE, TILE)] = f_s[r, :]
        p_out[pl.ds(r * TILE, TILE)] = p_s[r, :]
        v_out[pl.ds(r * TILE, TILE)] = v_s[r, :]


@functools.partial(jax.jit, static_argnames=(
    "max_dist_x", "max_dist_y", "bw", "iter_cap", "gap_scale", "is_cdna",
    "n_segs", "interpret"))
def chain_scores_device(hi, lo, qi, span, sid, n, avg, *, max_dist_x: int,
                        max_dist_y: int, bw: int, iter_cap: int,
                        gap_scale: float, is_cdna: bool, n_segs: int,
                        interpret: bool = False):
    """Batched bounded-lookback chaining scores.

    hi/lo/qi/span/sid: (B, N) int32 anchor fields (N % 128 == 0); n: (B, 1)
    int32 valid counts; avg: (B, 1) float32 avg_qspan_scaled per task.
    Returns f, p, v: (B, N) int32 (entries beyond n[b] are garbage).
    """
    B, N = hi.shape
    assert N % WINDOW == 0
    kern = functools.partial(_chain_kernel, max_dist_x, max_dist_y, bw,
                             iter_cap, gap_scale, is_cdna, n_segs)
    nt = N // WINDOW
    # whole (B,1) scalar arrays resident in SMEM; indexed by program_id(0).
    # Anchor streams and outputs are flat (B*N,) rank-1 arrays: TPU tiling
    # rules allow 128-sized rank-1 blocks at any batch size.
    per_read_scalar = pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM)
    stream = pl.BlockSpec((WINDOW,), lambda b, t: (b * nt + t,), memory_space=pltpu.SMEM)
    out_tile = pl.BlockSpec((WINDOW,), lambda b, t: (b * nt + t,), memory_space=pltpu.VMEM)
    flat = [x.reshape(B * N) for x in (hi, lo, qi, span, sid)]
    f, p, v = pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[per_read_scalar, per_read_scalar] + [stream] * 5,
        out_specs=[out_tile, out_tile, out_tile],
        out_shape=[jax.ShapeDtypeStruct((B * N,), jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((8, TILE), jnp.int32)] * 8,
        interpret=interpret,
    )(n, avg, *flat)
    return f.reshape(B, N), p.reshape(B, N), v.reshape(B, N)


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


def chain_scores_tpu(a: np.ndarray, max_dist_x: int, max_dist_y: int, bw: int,
                     max_iter: int, gap_scale: float, is_cdna: bool,
                     n_segs: int, interpret: bool | None = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-task convenience wrapper; returns (f, p, v) like the host DPs."""
    from ..ops.chain_ref import avg_qspan_scaled
    n = len(a)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi, lo, qi, span, sid = pack_anchors(a)
    f, p, v = chain_scores_device(
        hi[None], lo[None], qi[None], span[None], sid[None],
        np.array([[n]], np.int32), np.array([[avg_qspan_scaled(a)]], np.float32),
        max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
        iter_cap=min(WINDOW, max_iter), gap_scale=float(gap_scale),
        is_cdna=bool(is_cdna), n_segs=int(n_segs), interpret=bool(interpret))
    f = np.asarray(f)[0, :n].astype(np.int32)
    p = np.asarray(p)[0, :n].astype(np.int64)
    v = np.asarray(v)[0, :n].astype(np.int32)
    return f, p, v
