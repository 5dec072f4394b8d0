"""Pallas TPU anchor-chaining kernel, v2 (chunked).

Same contract as ops/chain_pallas.py (bounded 1024-anchor lookback, all
reference gates, no max_skip, ties -> largest j) but restructured for TPU
throughput: the v1 kernel spends most of its time in three cross-lane
reductions per anchor; v2 processes anchors in chunks of 8 and

  1. scores each of the 8 anchors against the full 1024-slot ring with the
     reductions DEFERRED: per anchor only a cheap sublane (8->1) max of the
     packed (score, 1024-age) key, accumulated into one row of an (8,128)
     tile; a single cross-lane rowmax then finalizes all 8 anchors at once;
  2. resolves the intra-chunk dependency (anchor c may chain onto anchors
     c' < c of the same chunk) algebraically: the 8x8 pairwise score matrix
     is closed under max-plus composition with 3 log-squarings — no
     sequential scan and no reductions (max-plus matmul = 8 shifted
     broadcast-adds);
  3. stores the ring in column layout (slot s -> row s%8, lane s//8) so a
     chunk's 8 writes are a single (8,1) column select;
  4. drops the in-kernel v[] carry: v (peak score along the predecessor
     chain, chain.c:110) is computed on the host by vectorized
     pointer-doubling (XLA gathers on TPU cost ~100ns/element — measured
     slower than the whole chaining kernel).

Packing: key = sc * 1024 + (1024 - d) with d = i - j in [1,1024]; max(key)
picks max score then smallest d (ties -> largest j, matching the C scan
order). Requires |sc| < 2^20, i.e. query length < ~1Mb; the wrapper falls
back to the v1 kernel beyond that.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_pallas import pack_anchors, WINDOW, TILE

NEG = -0x20000000  # masked-key sentinel (safe to add small offsets)
C = 8              # chunk size = sublane count


def _ilog2_tile(v, exact_max: int = 1 << 30):
    """floor(log2(v)) on an int32 tile; 0 -> 0 (chain.c:134 log_dd).
    When all gated values are < 2^24 (every real preset: distances/bw are
    at most a few hundred kb) the f32 exponent field gives the answer in
    3 ops; otherwise fall back to the shift cascade."""
    if exact_max < (1 << 24):
        bits = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
        return jnp.maximum((bits >> 23) - 127, 0)
    r = jnp.zeros_like(v)
    t = v
    for shift in (16, 8, 4, 2, 1):
        big = t >= (1 << shift)
        r = jnp.where(big, r + shift, r)
        t = jnp.where(big, t >> shift, t)
    return r


def _pair_key(dr, dq, same, hi_ok, span_i, f_j, d, avg,
              max_dist_x, max_dist_y, bw, iter_cap, gap_scale, is_cdna,
              n_segs, extra_ok=None, need_sc=True, d_min1=False):
    """Packed candidate key for predecessor candidates (vector ops only).
    dr/dq/d int32 tiles; span_i broadcastable; f_j predecessor scores.
    same=True specializes the single-segment non-cDNA fast path.
    d_min1=True asserts the caller guarantees d >= 1 (ring ages and the
    intra-chunk triangle both do), dropping that gate."""
    cap = min(iter_cap, WINDOW)
    if same is True and max_dist_x <= max_dist_y:
        # uniseg fast path with fused range algebra: under hi_ok the ring
        # is position-sorted so dr >= 0, and the reference gates
        # (dr != 0, dq > 0, dr <= mdx, dq <= min(mdy, mdx), |dr-dq| <= bw)
        # collapse to two comparisons on (min, max) of (dr, dq)
        # (chain.c:121-131 with max_dist_y >= max_dist_x).
        lohi = jnp.maximum(dr, dq)
        lolo = jnp.minimum(dr, dq)
        ok = (d <= cap) & hi_ok & (lolo >= 1) & (lohi <= max_dist_x)
        if not d_min1:
            ok &= d >= 1
        if extra_ok is not None:
            ok &= extra_ok
        dd = lohi - lolo
        ok &= dd <= bw
        min3 = jnp.minimum(lolo, span_i).astype(jnp.int32)
        log_dd = _ilog2_tile(dd, max(max_dist_x, max_dist_y, bw) + 1)
        c_lin = (dd.astype(jnp.float32) * avg).astype(jnp.int32)
        gap = c_lin + (log_dd >> 1)
        if gap_scale == 1.0:
            sc = min3 - gap
        else:
            sc = min3 - (gap.astype(jnp.float32) * jnp.float32(gap_scale)
                         + jnp.float32(0.499)).astype(jnp.int32)
        sc = sc + f_j
        key = sc * WINDOW + (WINDOW - d)
        key = jnp.where(ok, key, NEG)
        return key, (jnp.where(ok, sc, NEG) if need_sc else None)
    ok = (d >= 1) & (d <= iter_cap) & (d <= WINDOW) & hi_ok & (dr <= max_dist_x)
    if same is True:
        ok &= ~((dr == 0) | (dq <= 0))
        ok &= ~(dq > min(max_dist_y, max_dist_x))
        dd = jnp.abs(dr - dq)
        ok &= ~(dd > bw)
        same = jnp.full_like(ok, True)
    else:
        ok &= ~((same & (dr == 0)) | (dq <= 0))
        ok &= ~((same & (dq > max_dist_y)) | (dq > max_dist_x))
        dd = jnp.abs(dr - dq)
        ok &= ~(same & (dd > bw))
    if n_segs > 1 and not is_cdna:
        ok &= ~(same & (dr > max_dist_y))
    if extra_ok is not None:
        ok &= extra_ok

    min3 = jnp.minimum(jnp.minimum(dq, dr), span_i).astype(jnp.int32)
    log_dd = _ilog2_tile(dd, max(max_dist_x, max_dist_y, bw) + 1)
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
    sc = sc + f_j
    key = sc * WINDOW + (WINDOW - d)
    return jnp.where(ok, key, NEG), jnp.where(ok, sc, NEG)


def _chain_kernel_v2(max_dist_x: int, max_dist_y: int, bw: int, iter_cap: int,
                     gap_scale: float, is_cdna: bool, n_segs: int, R: int,
                     n_ref, avg_ref, hi_ref, lo_ref, qi_ref, span_ref, sid_ref,
                     f_out, p_out,
                     hi_s, lo_s, qi_s, sid_s, f_s, d_s, fo_s, po_s):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hi_s[:] = jnp.full((R * C, TILE), -0x7FFFFFFF, jnp.int32)
        lo_s[:] = jnp.zeros((R * C, TILE), jnp.int32)
        qi_s[:] = jnp.zeros((R * C, TILE), jnp.int32)
        sid_s[:] = jnp.zeros((R * C, TILE), jnp.int32)
        f_s[:] = jnp.zeros((R * C, TILE), jnp.int32)
        d_s[:] = jnp.full((R * C, TILE), 4 * WINDOW, jnp.int32)

    srow = jax.lax.broadcasted_iota(jnp.int32, (C, TILE), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (C, TILE), 1)
    row_iota = srow  # row index tile
    neg_tile = jnp.full((C, TILE), NEG, jnp.int32)
    uniseg = n_segs == 1 and not is_cdna

    def chunk(r, avg, cc, _):
        # r selects this program's interleaved batch row (R independent DP
        # chains per program instance: their bodies have no data deps, so
        # the scheduler overlaps them — the latency-bound chunk chain is
        # hidden behind its neighbors' work)
        o = r * WINDOW   # offset of row r's data in the fused stream block
        s0 = r * C       # offset of row r's rows in the fused scratches
        i0 = t * WINDOW + cc * C
        # No validity branch: padded anchors carry a sentinel hi that fails
        # every gate, so computing them is harmless — and a per-chunk
        # conditional costs far more than the wasted lanes.
        if True:
            # ---- load the 8 anchors; build column and row layouts ----
            # (row layouts only for the fields phase B consumes)
            # one SMEM read per scalar, shared by the layout builds and
            # the phase-A broadcasts (the scalar core is on the critical
            # path of this loop)
            sc_hi = [hi_ref[o + cc * C + c] for c in range(C)]
            sc_lo = [lo_ref[o + cc * C + c] for c in range(C)]
            sc_qi = [qi_ref[o + cc * C + c] for c in range(C)]
            sc_span = [span_ref[o + cc * C + c] for c in range(C)]
            sc_sid = (None if uniseg
                      else [sid_ref[o + cc * C + c] for c in range(C)])
            col_fields = (sc_hi, sc_lo, sc_qi, sc_span) + \
                (() if uniseg else (sc_sid,))
            row_fields = (sc_hi, sc_lo, sc_qi) + \
                (() if uniseg else (sc_sid,))
            cols = []
            rows = []
            for vals in col_fields:
                col = neg_tile
                for c in range(C):
                    col = jnp.where(srow == c, vals[c], col)
                cols.append(col)
            for vals in row_fields:
                row = neg_tile
                for c in range(C):
                    row = jnp.where(scol == c, vals[c], row)
                rows.append(row)
            if uniseg:
                hi_c, lo_c, qi_c, span_c = cols
                sid_c = None
                hi_r, lo_r, qi_r = rows
                sid_r = None
            else:
                hi_c, lo_c, qi_c, span_c, sid_c = cols
                hi_r, lo_r, qi_r, sid_r = rows

            # ---- phase A: ring candidates, reductions deferred ----
            ring_hi = hi_s[s0:s0 + C, :]
            ring_lo = lo_s[s0:s0 + C, :]
            ring_qi = qi_s[s0:s0 + C, :]
            ring_sid = sid_s[s0:s0 + C, :]
            ring_f = f_s[s0:s0 + C, :]
            ring_d = d_s[s0:s0 + C, :]
            key_acc = neg_tile
            for c in range(C):
                same_a = True if uniseg else (ring_sid == sc_sid[c])
                key_c, _ = _pair_key(
                    sc_lo[c] - ring_lo, sc_qi[c] - ring_qi, same_a,
                    ring_hi == sc_hi[c], sc_span[c], ring_f, ring_d + c, avg,
                    max_dist_x, max_dist_y, bw, iter_cap, gap_scale,
                    is_cdna, n_segs, need_sc=False, d_min1=True)
                part = jnp.max(key_c, axis=0, keepdims=True)  # (1,128)
                part = jnp.broadcast_to(part, (C, TILE))
                key_acc = jnp.where(srow == c, part, key_acc)
            ring_key = jnp.max(key_acc, axis=1, keepdims=True)  # (8,1)

            # ---- phase B: intra-chunk pairwise scores (columns=preds) ----
            tri = (scol < srow) & (scol < C)
            same_b = True if uniseg else (sid_c == sid_r)
            pkey, _ = _pair_key(
                lo_c - lo_r, qi_c - qi_r, same_b, hi_c == hi_r,
                span_c, 0, srow - scol, avg,
                max_dist_x, max_dist_y, bw, iter_cap, gap_scale,
                is_cdna, n_segs, extra_ok=tri, need_sc=False, d_min1=True)

            # Max-plus closure over packed keys. compose(A, B) adds B's
            # score field while keeping A's first-hop (1024-d) tie-break
            # bits, so the closure directly yields each anchor's best
            # packed key — no transposes, no extra reductions.
            # S starts as paths of length 1 (pkey); 3 self-compositions
            # cover lengths 1..8 (re-floored so NEG+NEG stays in range).
            S = pkey
            for _ in range(3):
                acc = S
                for k in range(C):
                    acc = jnp.maximum(
                        acc, S[:, k:k + 1] + (S[k:k + 1, :] & ~(WINDOW - 1)))
                S = jnp.maximum(acc, NEG)

            # f_init packed: ring candidates (with their d) or bare span
            span_key = span_c[:, 0:1] * WINDOW
            fi_key = jnp.maximum(ring_key, span_key)  # (8,1)
            best_key = fi_key
            for k in range(C):
                a_col = S[:, k:k + 1]
                term = a_col + (fi_key[k:k + 1, 0:1] & ~(WINDOW - 1))
                # guard: NEG + a large f would wrap into a false candidate
                best_key = jnp.maximum(
                    best_key, jnp.where(a_col > NEG // 2, term, NEG))
            best_sc = best_key >> 10
            best_d = WINDOW - (best_key & (WINDOW - 1))
            better = best_sc > span_c[:, 0:1]
            # absolute predecessor index: i = i0 + row
            i_col = i0 + row_iota[:, 0:1]
            p_col = jnp.where(better, i_col - best_d, -1)
            f_final = jnp.where(better, best_sc, span_c[:, 0:1])

            # ---- ring + output updates (single column selects) ----
            at = scol == cc
            sl = slice(s0, s0 + C)
            hi_s[sl, :] = jnp.where(at, hi_c[:, 0:1], ring_hi)
            lo_s[sl, :] = jnp.where(at, lo_c[:, 0:1], ring_lo)
            qi_s[sl, :] = jnp.where(at, qi_c[:, 0:1], ring_qi)
            if not uniseg:
                sid_s[sl, :] = jnp.where(at, sid_c[:, 0:1], ring_sid)
            f_s[sl, :] = jnp.where(at, f_final, ring_f)
            d_s[sl, :] = jnp.where(at, C - row_iota[:, 0:1], ring_d + C)
            fo_s[sl, :] = jnp.where(at, f_final, fo_s[sl, :])
            po_s[sl, :] = jnp.where(at, p_col, po_s[sl, :])

        return 0

    # Unrolled chunk loop: the per-iteration loop/scalar overhead is a
    # significant fraction of the ~600-op chunk body (measured on v5e:
    # 16M -> 22M anchors/s going 1x -> 4x; 8x regresses on icache).
    # With R > 1 the unroll body interleaves R independent rows' chunks;
    # the unroll factor shrinks to keep the total body size (U*R chunk
    # bodies) roughly constant against the icache budget.
    avgs = [avg_ref[b * R + r, 0] for r in range(R)]
    U = max(1, 4 // max(1, R // 2))

    def chunkU(ccu, _):
        for u_ in range(U):
            for r in range(R):
                chunk(r, avgs[r], U * ccu + u_, 0)
        return 0

    jax.lax.fori_loop(0, TILE // U, chunkU, 0)
    # flush outputs in ring (column) layout; host/XLA unpermutes
    for r in range(R):
        for c in range(C):
            f_out[pl.ds(r * WINDOW + c * TILE, TILE)] = fo_s[r * C + c, :]
            p_out[pl.ds(r * WINDOW + c * TILE, TILE)] = po_s[r * C + c, :]


def _unpermute(x, B, N):
    """Undo the column slot layout: flat[row*128+lane] -> anchor lane*8+row."""
    nb = N // WINDOW
    return (x.reshape(B, nb, C, TILE).swapaxes(2, 3).reshape(B, N))


def v_carry_host(f: np.ndarray, p: np.ndarray) -> np.ndarray:
    """v[i] = max f along the predecessor chain — host-side vectorized
    pointer doubling over (B, N) batches (chain.c:110 semantics)."""
    B, N = f.shape
    idx = np.broadcast_to(np.arange(N, dtype=np.int64), (B, N))
    ptr = np.where(p >= 0, p, idx).astype(np.int64)
    v = f.copy()
    steps = max(1, int(np.ceil(np.log2(max(N, 2)))))
    for _ in range(steps):
        v = np.maximum(v, np.take_along_axis(v, ptr, axis=1))
        ptr = np.take_along_axis(ptr, ptr, axis=1)
    return v


@functools.partial(jax.jit, static_argnames=(
    "max_dist_x", "max_dist_y", "bw", "iter_cap", "gap_scale", "is_cdna",
    "n_segs", "interpret", "rows_per_program"))
def chain_scores_device_v2(hi, lo, qi, span, sid, n, avg, *, max_dist_x: int,
                           max_dist_y: int, bw: int, iter_cap: int,
                           gap_scale: float, is_cdna: bool, n_segs: int,
                           interpret: bool = False,
                           rows_per_program: int = 1):
    """Batched bounded-lookback chaining scores, v2 kernel. Returns (f, p);
    compute v with v_carry_host (or the native runtime) on the host.
    rows_per_program > 1 interleaves that many batch rows' (independent)
    DP chains per program instance to hide the chunk latency; B must be
    divisible by it."""
    B, N = hi.shape
    R = rows_per_program
    assert N % WINDOW == 0 and B % R == 0
    kern = functools.partial(_chain_kernel_v2, max_dist_x, max_dist_y, bw,
                             iter_cap, gap_scale, is_cdna, n_segs, R)
    nt = N // WINDOW
    per_read_scalar = pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM)
    stream = pl.BlockSpec((R * WINDOW,), lambda b, t: (b * nt + t,), memory_space=pltpu.SMEM)
    out_tile = pl.BlockSpec((R * WINDOW,), lambda b, t: (b * nt + t,), memory_space=pltpu.VMEM)

    def pack(x):
        if R == 1:
            return x.reshape(B * N)
        return (x.reshape(B // R, R, nt, WINDOW).swapaxes(1, 2)
                .reshape(B * N))

    def unpack(x):
        if R == 1:
            return x
        return (x.reshape(B // R, nt, R, WINDOW).swapaxes(1, 2)
                .reshape(B, N).reshape(B * N))

    flat = [pack(x) for x in (hi, lo, qi, span, sid)]
    f, p = pl.pallas_call(
        kern,
        grid=(B // R, nt),
        in_specs=[per_read_scalar, per_read_scalar] + [stream] * 5,
        out_specs=[out_tile, out_tile],
        out_shape=[jax.ShapeDtypeStruct((B * N,), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((R * C, TILE), jnp.int32)] * 8,
        interpret=interpret,
    )(n, avg, *flat)
    return _unpermute(unpack(f), B, N), _unpermute(unpack(p), B, N)


def chain_scores_tpu_v2(a: np.ndarray, max_dist_x: int, max_dist_y: int,
                        bw: int, max_iter: int, gap_scale: float,
                        is_cdna: bool, n_segs: int,
                        interpret: bool | None = None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-task wrapper; returns (f, p, v) like the host DPs."""
    from .chain_ref import avg_qspan_scaled
    n = len(a)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi, lo, qi, span, sid = pack_anchors(a)
    f, p = chain_scores_device_v2(
        hi[None], lo[None], qi[None], span[None], sid[None],
        np.array([[n]], np.int32), np.array([[avg_qspan_scaled(a)]], np.float32),
        max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
        iter_cap=min(WINDOW, max_iter), gap_scale=float(gap_scale),
        is_cdna=bool(is_cdna), n_segs=int(n_segs), interpret=bool(interpret))
    f = np.asarray(f)[:, :n].astype(np.int32)
    p = np.asarray(p)[:, :n].astype(np.int64)
    v = v_carry_host(f, p)
    return f[0], p[0], v[0]
